"""FLOPs of ONE stage-1 'train' step (ref solver.py train mode:
clf_step + encode/decode_step + adversarial encoder update, SURVEY §3.2)
at bench geometry, via XLA cost_analysis of a freshly-jitted UNDONATED
step on the CPU backend.

Runs as a standalone subprocess, for two reasons:

1. The parent bench process owns the (single-client) TPU runtime;
   forcing JAX_PLATFORMS=cpu here keeps libtpu untouched. HLO flop
   counts are arithmetic, not schedule — matmul/conv FLOPs are
   backend-independent, so the CPU-lowered count stands in for the TPU
   program's.
2. Re-lowering the donated 25-step train scan for cost_analysis hung
   indefinitely (>20 min, no exception) on this stack once; running in a
   child lets bench.py kill a hang with subprocess timeout instead of
   hanging the driver's bench run.

Prints one JSON line: {"flops_per_step": N, "bytes_per_step": N|null,
"batch": B, "pairs": bool}.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=None,
                    help="override Hps batch_size (tools/train_profile.py ladder)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # the axon TPU plugin ignores the env var; only the config call
    # reliably forces the CPU backend (recorded environment note)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zerospeech_tts_tpu.config import Hps
    from zerospeech_tts_tpu.train import Solver

    hps = Hps().replace(n_speakers=8)  # bench train geometry (bench.py)
    if args.batch_size:
        hps = hps.replace(batch_size=args.batch_size)
    sol = Solver(hps)
    st = sol.init_state(jax.random.PRNGKey(0))
    b = hps.batch_size
    # same fields DeviceDataset.sample_batch(pairs=True) feeds train_many
    batch = {
        "x": jnp.zeros((b, hps.seg_len, hps.n_feat), jnp.float32),
        "spk": jnp.zeros((b,), jnp.int32),
        "x2": jnp.zeros((b, hps.seg_len, hps.n_feat), jnp.float32),
        "pair_dt": jnp.zeros((b,), jnp.int32),
    }
    raw = type(sol).step_train.__wrapped__  # un-jitted body, no donation
    lowered = jax.jit(raw, static_argnums=0).lower(sol, st, batch)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = ca.get("bytes accessed")
    print(
        json.dumps(
            {
                "flops_per_step": flops,
                "bytes_per_step": float(byts) if byts is not None else None,
                "batch": b,
                "pairs": True,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
