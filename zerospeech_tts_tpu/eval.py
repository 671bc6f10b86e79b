"""Evaluation utilities for the challenge metrics the framework's outputs
feed (SURVEY.md §4: the reference relies on the external ZeroSpeech'19
toolkit; the two metrics computable locally are reimplemented here so
training runs can track them).

* **Unit bitrate** — the official ZR19 bitrate of a set of dumped unit
  files: B = n_frames * H(symbol) / total_duration_seconds, where symbols
  are whole unit vectors and H is the empirical entropy over the corpus.
* **Reconstruction L1** — mel/lin L1 of decode(encode(x), speaker) on
  held-out segments (the BASELINE.json "mel-reconstruction L1" gate).
* **Unit statistics** — active-bit fraction and per-dimension usage
  (collapse diagnostics).
"""

from __future__ import annotations

import math
from collections import Counter
from pathlib import Path

import numpy as np


def load_unit_files(units_dir: str | Path) -> list[np.ndarray]:
    from zerospeech_tts_tpu.convert import read_units

    files = sorted(Path(units_dir).glob("*.txt"))
    if not files:
        raise ValueError(f"no unit files in {units_dir}")
    return [read_units(fp) for fp in files]


def unit_bitrate(units_dir: str | Path, frame_seconds: float, units=None) -> dict:
    """Official-style bitrate over all unit files in a directory.

    frame_seconds: duration of one latent frame (hop * downsample / sr;
    0.1 s for the default 200-hop x8-downsample 16 kHz config).
    """
    units = units if units is not None else load_unit_files(units_dir)
    counts: Counter = Counter()
    n_frames = 0
    for u in units:
        n_frames += u.shape[0]
        for row in u:
            counts[row.tobytes()] += 1
    total = sum(counts.values())
    entropy = -sum((c / total) * math.log2(c / total) for c in counts.values())
    duration = n_frames * frame_seconds
    return {
        "n_utterances": len(units),
        "n_frames": n_frames,
        "n_symbols": len(counts),
        "symbol_entropy_bits": round(entropy, 4),
        "duration_seconds": round(duration, 2),
        "bitrate_bits_per_second": round(n_frames * entropy / duration, 2) if duration else 0.0,
    }


def unit_stats(units_dir: str | Path, units=None) -> dict:
    """Collapse diagnostics over dumped units."""
    rows = units if units is not None else load_unit_files(units_dir)
    u = np.concatenate(rows, axis=0)
    per_dim = u.mean(axis=0)
    return {
        "active_fraction": round(float(u.mean()), 4),
        "dead_dims": int(np.sum((per_dim < 1e-3) | (per_dim > 1 - 1e-3))),
        "n_dims": int(u.shape[1]),
    }


def unit_stability(
    solver, state, dataset_path: str | Path, hps, feat: str = "lin",
    split: str = "train", n_utts: int = 16, seed: int = 0,
) -> dict:
    """Window-placement stability of the discrete units.

    Encodes each utterance twice — as-is and shifted by one downsample
    stride (the first hps.downsample feature frames dropped). A
    placement-invariant encoder yields identical units on the overlap
    (shifted units[j] == original units[j+1]); the mean bit agreement is
    the property the stage-1 pair objective optimizes, and a direct
    driver of the ZR19 bitrate metric (stable units -> fewer spurious
    symbols -> lower entropy)."""
    import h5py
    import json

    import jax
    import jax.numpy as jnp

    from zerospeech_tts_tpu.models import hard_units

    stats = None
    if hps.speaker_norm:
        from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats

        stats = SpeakerStats.load(dataset_path, feat)
    ds = hps.downsample
    rng = np.random.default_rng(seed)
    feats = []
    with h5py.File(dataset_path, "r") as f:
        pool = [
            (spk, utt)
            for spk in f[split]
            for utt in f[split][spk]
            if f[f"{split}/{spk}/{utt}/{feat}"].shape[0] >= 4 * ds
        ]
        if not pool:
            raise ValueError("no utterances long enough for stability eval")
        for i in rng.choice(len(pool), size=min(n_utts, len(pool)), replace=False):
            spk, utt = pool[i]
            arr = f[f"{split}/{spk}/{utt}/{feat}"][:]
            if stats is not None:
                arr = stats.normalize(arr, spk)
            feats.append(arr)

    @jax.jit
    def units_of(enc_params, x):
        return hard_units(solver.encoder.apply(enc_params, x[None]))[0]

    def encode(arr):  # pad to a 256-frame bucket: few compiles, not one per length
        t = arr.shape[0]
        tb = -(-t // 256) * 256
        padded = np.pad(arr, ((0, tb - t), (0, 0)))
        return np.asarray(units_of(state.enc, jnp.asarray(padded)))[: t // ds]

    agree, n_bits = 0.0, 0
    for arr in feats:
        t = (arr.shape[0] // ds) * ds  # whole latent frames only
        ua = encode(arr[:t])
        ub = encode(arr[ds:t])
        k = min(ua.shape[0] - 1, ub.shape[0])
        if k <= 0:
            continue
        agree += float((ua[1 : k + 1] == ub[:k]).sum())
        n_bits += k * ua.shape[1]
    return {
        "unit_stability": round(agree / max(n_bits, 1), 4),
        "n_utterances": len(feats),
        "shift_frames": ds,
        "feat": feat,
        "split": split,
    }


def reconstruction_l1(
    solver, state, dataset_path: str | Path, hps, feat: str = "lin",
    split: str = "train", n_segments: int = 64, seed: int = 0,
) -> dict:
    """decode(encode(x), true speaker) L1 on sampled segments — the
    BASELINE.json reconstruction gate, measured with deterministic
    (inference-mode) units."""
    import h5py
    import json

    import jax
    import jax.numpy as jnp

    from zerospeech_tts_tpu.models import discretize

    stats = None
    if hps.speaker_norm:
        from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats

        stats = SpeakerStats.load(dataset_path, feat)
    rng = np.random.default_rng(seed)
    segs, spks = [], []
    with h5py.File(dataset_path, "r") as f:
        speakers = json.loads(f.attrs["speakers"])
        pool = [
            (spk, utt, f[f"{split}/{spk}/{utt}/{feat}"].shape[0])
            for spk in f[split]
            for utt in f[split][spk]
            if f[f"{split}/{spk}/{utt}/{feat}"].shape[0] >= hps.seg_len
        ]
        if not pool:
            raise ValueError("no segments long enough for reconstruction eval")
        for i in rng.integers(0, len(pool), n_segments):
            spk, utt, t = pool[i]
            t0 = int(rng.integers(0, t - hps.seg_len + 1))
            seg = f[f"{split}/{spk}/{utt}/{feat}"][t0 : t0 + hps.seg_len]
            if stats is not None:
                seg = stats.normalize(seg, spk)  # the model's training space
            segs.append(seg)
            spks.append(speakers[spk])

    x = jnp.asarray(np.stack(segs))
    spk = jnp.asarray(np.asarray(spks, np.int32))

    @jax.jit
    def recon(enc_params, dec_params, x, spk):
        logits = solver.encoder.apply(enc_params, x)
        z = discretize(logits, hps.enc_mode, hps.gumbel_temp, None)
        xh = solver.decoder.apply(dec_params, z, spk)
        return jnp.abs(xh - x).mean()

    l1 = float(recon(state.enc, state.dec, x, spk))
    return {"recon_l1": round(l1, 6), "n_segments": n_segments, "feat": feat, "split": split}
