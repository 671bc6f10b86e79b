"""Checkpoint / resume (ref Solver.save_model / load_model — torch.save of
all module+optimizer states; SURVEY.md §5 "Checkpoint / resume").

TPU-native counterpart: orbax-checkpoint over the whole TrainState pytree
(sharded-array aware), keeping the reference's semantics: stage-2 MUST
start from stage-1 weights, and ``--load_model`` resumes from the latest
step in the checkpoint dir.
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp

from zerospeech_tts_tpu.train.solver import TrainState


class CheckpointManager:
    def __init__(self, ckpt_dir: str | Path, max_to_keep: int = 3, hps=None):
        self.path = Path(ckpt_dir).absolute()
        self.path.mkdir(parents=True, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self._hps = hps
        if hps is not None:
            self._check_or_write_hps(hps)

    # data-space fields a checkpoint is only valid for (mismatches corrupt
    # conversion silently, e.g. speaker_norm flipped between train and convert)
    _CRITICAL = ("speaker_norm", "n_feat", "emb_size", "enc_mode", "downsample")

    def _check_or_write_hps(self, hps) -> None:
        import dataclasses
        import json
        import warnings

        meta_path = self.path / "hps.json"
        current = dataclasses.asdict(hps)
        if meta_path.exists():
            saved = json.loads(meta_path.read_text())
            diffs = {
                k: (saved.get(k), current.get(k))
                for k in self._CRITICAL
                if saved.get(k) != current.get(k)
            }
            if diffs:
                warnings.warn(
                    f"checkpoint dir {self.path} was written with different "
                    f"data-space hps: {diffs} — restored weights will not "
                    f"match the current feature space",
                    stacklevel=3,
                )
        else:
            meta_path.write_text(json.dumps(current, indent=2) + "\n")

    def save(self, state: TrainState, wait: bool = False) -> None:
        self.mgr.save(int(state.step), args=ocp.args.StandardSave(state))
        if wait:
            self.mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def restore(self, template: TrainState, step: int | None = None) -> TrainState:
        """Restore into the structure of ``template`` (from Solver.init_state),
        preserving shardings. Checkpoints written by an older TrainState
        schema restore with missing fields filled from the template (schema
        evolution, e.g. the train_start field added after round-1 ckpts)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.path}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        try:
            return self.mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        except (ValueError, KeyError):
            # structure mismatch: restore raw (a nested dict keyed by the
            # dataclass field names) and fill missing fields from template
            import dataclasses

            raw = self.mgr.restore(step)
            fields = {
                f.name: raw[f.name]
                if isinstance(raw, dict) and f.name in raw
                else getattr(template, f.name)
                for f in dataclasses.fields(template)
            }
            return type(template)(**fields)

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
