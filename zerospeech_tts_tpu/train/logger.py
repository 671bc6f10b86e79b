"""Metrics logging (ref ``Logger`` wrapping tensorboardX SummaryWriter,
utils.py:~190-220, + console prints of iteration losses).

Structured JSONL is the primary sink (machine-readable for the bench
harness); tensorboardX is attached when available. Scalars are pulled to
host in one block per log call to avoid per-metric device syncs.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np


class Logger:
    def __init__(self, log_dir: str | Path | None = None, use_tensorboard: bool = True, echo=print):
        self.log_dir = Path(log_dir) if log_dir else None
        self._jsonl = None
        self._tb = None
        self._echo = echo
        self._t0 = time.time()
        if self.log_dir:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
            if use_tensorboard:
                try:
                    from tensorboardX import SummaryWriter

                    self._tb = SummaryWriter(str(self.log_dir))
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: dict, prefix: str = "") -> None:
        vals = jax.device_get(metrics)
        vals = {k: float(np.asarray(v)) for k, v in vals.items()}
        tag = f"{prefix}/" if prefix else ""
        if self._echo:
            body = " ".join(f"{k}={v:.4g}" for k, v in vals.items())
            self._echo(f"[{time.time() - self._t0:8.1f}s] {prefix} step {step}: {body}")
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, "mode": prefix, **vals}) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in vals.items():
                self._tb.add_scalar(tag + k, v, step)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
