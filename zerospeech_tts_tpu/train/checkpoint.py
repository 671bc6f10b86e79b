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
    def __init__(self, ckpt_dir: str | Path, max_to_keep: int = 3):
        self.path = Path(ckpt_dir).absolute()
        self.path.mkdir(parents=True, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: TrainState, wait: bool = False) -> None:
        self.mgr.save(int(state.step), args=ocp.args.StandardSave(state))
        if wait:
            self.mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def restore(self, template: TrainState, step: int | None = None) -> TrainState:
        """Restore into the structure of ``template`` (from Solver.init_state),
        preserving shardings."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.path}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return self.mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
