"""Deployment export — a lean, self-contained inference bundle.

No reference counterpart (ref --load_model points at the full training
checkpoint, solver.py save_model/load_model per SURVEY.md §5). The
training TrainState carries four modules plus four Adam moment sets —
roughly 9x the bytes inference needs. Serving and conversion need only
the encoder, the decoder, the speaker id-map, the per-speaker
normalization statistics, and the hps — so ``zstts export`` writes
exactly that:

    <dir>/hps.json        # full Hps dict + "audio" block (load_configs shape)
    <dir>/meta.json       # {"version", "feat", "step"}
    <dir>/speakers.json   # name -> id
    <dir>/stats.npz       # per-speaker mean/std ("<spk>|mean" keys); only
                          #   when the model was trained with speaker_norm
    <dir>/model/          # orbax: {"enc": ..., "dec": ...}

``load_export(dir)`` returns an :class:`ExportBundle`; the CLI verbs
``convert``, ``convert-single``, and ``serve`` accept ``--from-export
DIR`` in place of ``-dataset_path``/``-ckpt_dir`` — a serving host needs
the bundle and nothing else (no h5 corpus, no training checkpoints).
"""

from __future__ import annotations

import dataclasses
import json
import shutil
from pathlib import Path

import numpy as np

from zerospeech_tts_tpu.config import AudioConfig, Hps

EXPORT_VERSION = 1


@dataclasses.dataclass
class ExportBundle:
    hps: Hps
    acfg: AudioConfig
    enc: dict
    dec: dict
    speakers: dict[str, int]
    stats: object | None  # SpeakerStats when the model uses speaker_norm
    feat: str
    step: int | None


def export_model(
    out_dir: str | Path,
    hps: Hps,
    acfg: AudioConfig,
    enc_params,
    dec_params,
    speakers: dict[str, int],
    stats=None,
    feat: str = "lin",
    step: int | None = None,
) -> dict:
    """Write the inference bundle. Overwrites an existing bundle in place
    (the model/ subtree is replaced atomically enough for a local dir)."""
    import jax
    import orbax.checkpoint as ocp

    if hps.speaker_norm and stats is None:
        raise ValueError(
            "hps.speaker_norm is on but no stats were given — a bundle "
            "without stats would (de)normalize wrongly at inference"
        )
    out = Path(out_dir).absolute()
    out.mkdir(parents=True, exist_ok=True)
    cfg = dataclasses.asdict(hps)
    cfg["audio"] = dataclasses.asdict(acfg)
    (out / "hps.json").write_text(json.dumps(cfg, indent=2) + "\n")
    (out / "meta.json").write_text(
        json.dumps({"version": EXPORT_VERSION, "feat": feat, "step": step}) + "\n"
    )
    (out / "speakers.json").write_text(json.dumps(speakers, indent=2) + "\n")
    if stats is not None:
        arrs = {}
        for spk in stats.mean:
            arrs[f"{spk}|mean"] = np.asarray(stats.mean[spk], np.float32)
            arrs[f"{spk}|std"] = np.asarray(stats.std[spk], np.float32)
        np.savez(out / "stats.npz", **arrs)

    model_dir = out / "model"
    if model_dir.exists():
        shutil.rmtree(model_dir)
    # host numpy leaves: the bundle must not bake in device placement
    params = jax.tree.map(np.asarray, {"enc": enc_params, "dec": dec_params})
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(model_dir, params)
    ckptr.wait_until_finished()
    ckptr.close()

    n_bytes = sum(leaf.nbytes for leaf in jax.tree.leaves(params))
    return {
        "path": str(out),
        "params_bytes": int(n_bytes),
        "n_speakers": len(speakers),
        "feat": feat,
        "step": step,
    }


def load_export(bundle_dir: str | Path) -> ExportBundle:
    import orbax.checkpoint as ocp

    from zerospeech_tts_tpu.config import load_configs
    from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats

    out = Path(bundle_dir).absolute()
    if not (out / "meta.json").exists():
        raise FileNotFoundError(f"{out} is not an export bundle (no meta.json)")
    meta = json.loads((out / "meta.json").read_text())
    if meta.get("version", 0) > EXPORT_VERSION:
        raise ValueError(
            f"bundle {out} has version {meta['version']} > supported {EXPORT_VERSION}"
        )
    hps, acfg = load_configs(out / "hps.json")
    speakers = json.loads((out / "speakers.json").read_text())
    stats = None
    if (out / "stats.npz").exists():
        mean, std = {}, {}
        with np.load(out / "stats.npz") as z:
            for key in z.files:
                spk, kind = key.rsplit("|", 1)
                (mean if kind == "mean" else std)[spk] = z[key]
        stats = SpeakerStats(mean, std)
    if hps.speaker_norm and stats is None:
        raise ValueError(f"bundle {out}: hps.speaker_norm is on but stats.npz is missing")

    ckptr = ocp.StandardCheckpointer()
    try:
        # restore via the saved tree's own metadata (shape/dtype template):
        # silences orbax's no-target-tree UNSAFE warning without requiring
        # the caller to rebuild the module structure
        import jax

        md = ckptr.metadata(out / "model").item_metadata
        abstract = jax.tree.map(lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), md)
        params = ckptr.restore(out / "model", abstract)
    except Exception:
        params = ckptr.restore(out / "model")
    ckptr.close()
    return ExportBundle(
        hps=hps,
        acfg=acfg,
        enc=params["enc"],
        dec=params["dec"],
        speakers=speakers,
        stats=stats,
        feat=meta.get("feat", "lin"),
        step=meta.get("step"),
    )
