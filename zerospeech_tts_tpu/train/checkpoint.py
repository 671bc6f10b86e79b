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
    def __init__(
        self,
        ckpt_dir: str | Path,
        max_to_keep: int = 3,
        hps=None,
        allow_migration: bool = False,
        read_only: bool = False,
    ):
        """``allow_migration=False`` (default) makes restore STRICT: a
        checkpoint whose structure doesn't match the template refuses to
        load rather than silently back-filling template (random-init)
        fields — a corrupt or wrong-architecture checkpoint must never
        restore "successfully". Pass allow_migration=True (CLI
        ``--allow-schema-migration``) to accept checkpoints written by an
        older TrainState schema, filling ONLY the fields the checkpoint
        lacks from the template.

        ``read_only=True`` is for restore-source directories (e.g.
        ``--load_model DIR``): the path must already exist, nothing is
        created, and hps.json is checked but never written — a pure load
        must not mutate someone else's artifact."""
        self.path = Path(ckpt_dir).absolute()
        self.read_only = read_only
        if read_only:
            if not self.path.is_dir():
                raise FileNotFoundError(f"checkpoint dir {self.path} does not exist")
        else:
            self.path.mkdir(parents=True, exist_ok=True)
        self.allow_migration = allow_migration
        self.mgr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=not read_only
            ),
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
                raise ValueError(
                    f"checkpoint dir {self.path} was written with different "
                    f"data-space hps: {diffs} (saved, current) — restored "
                    f"weights would not match the current feature space. Use "
                    f"a fresh -ckpt_dir or the hps the checkpoint was trained "
                    f"with."
                )
        elif not self.read_only:
            meta_path.write_text(json.dumps(current, indent=2) + "\n")

    def save(self, state: TrainState, wait: bool = False) -> None:
        """Save at the state's step. A step that already exists is
        OVERWRITTEN (a --load_model STEP rewind re-reaches old step
        numbers; orbax would otherwise raise StepAlreadyExists mid-run).
        The overwrite path syncs before deleting and after re-saving to
        keep the crash window (old step gone, new one not yet durable)
        as narrow as orbax allows; older retained steps still cover a
        crash inside it."""
        step = int(state.step)
        overwrite = step in self.mgr.all_steps()
        if overwrite:
            self.mgr.wait_until_finished()
            self.mgr.delete(step)
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        if wait or overwrite:
            self.mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def all_steps(self) -> list[int]:
        return sorted(self.mgr.all_steps())

    def restore(self, template: TrainState, step: int | None = None) -> TrainState:
        """Restore into the structure of ``template`` (from Solver.init_state),
        preserving shardings. Structure mismatches raise unless the manager
        was built with allow_migration=True, in which case fields missing
        from the checkpoint are filled from the template (schema evolution,
        e.g. the train_start field added after round-1 ckpts); fields the
        checkpoint HAS must still load cleanly."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.path}")
        if step not in self.mgr.all_steps():
            raise FileNotFoundError(
                f"step {step} not in {self.path} (available: {self.all_steps()})"
            )
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        try:
            return self.mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        except (ValueError, KeyError) as e:
            if not self.allow_migration:
                raise RuntimeError(
                    f"checkpoint {self.path} step {step} does not match the "
                    f"current TrainState structure ({e}). If it was written "
                    f"by an older schema, pass --allow-schema-migration; a "
                    f"corrupt or wrong-architecture checkpoint should NOT be "
                    f"loaded."
                ) from e
            # migration: restore raw (a nested dict keyed by the dataclass
            # field names) and fill only MISSING fields from the template
            import dataclasses

            raw = self.mgr.restore(step)
            if not isinstance(raw, dict):
                raise RuntimeError(
                    f"checkpoint {self.path} step {step} is not a TrainState "
                    f"mapping (got {type(raw).__name__}) — refusing to migrate"
                ) from e
            fields = {}
            for f in dataclasses.fields(template):
                if f.name in raw:
                    tleaves = jax.tree.leaves(getattr(template, f.name))
                    rleaves = jax.tree.leaves(raw[f.name])
                    if len(tleaves) != len(rleaves) or any(
                        getattr(t, "shape", None) != getattr(r, "shape", None)
                        for t, r in zip(tleaves, rleaves)
                    ):
                        raise RuntimeError(
                            f"checkpoint field {f.name!r} does not match the "
                            f"template structure — wrong architecture, refusing "
                            f"to migrate"
                        ) from e
                    fields[f.name] = raw[f.name]
                else:
                    fields[f.name] = getattr(template, f.name)
            return type(template)(**fields)

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
