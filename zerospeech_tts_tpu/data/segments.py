"""Segment sampler / index (ref make_single_samples.py:~1-60; SURVEY.md §2
"Segment sampler / index").

Pre-samples N fixed-length (seg_len) training windows ``(speaker, utt, t0)``
into a JSON index so the training loader draws O(1) random segments, exactly
the reference's mechanism for avoiding variable-length batches (SURVEY.md §5
"Long-context": sequence length is avoided by design).
"""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np


def make_segment_index(
    h5_path: str | Path,
    index_path: str | Path,
    seg_len: int,
    n_samples: int,
    split: str = "train",
    seed: int = 0,
    pair_offset_max: int | None = None,
    pair_grid: int = 1,
) -> list[dict]:
    """Sample n_samples segments uniformly over utterances long enough for a
    (segment, paired-segment) draw. Each entry carries the same-utterance
    pair offset t1 used by stage-1 (ref dataloader returns same-utterance
    segment pairs). ``pair_grid`` snaps t1 - t0 to a multiple (pass
    hps.downsample so the pair's LATENT frames align exactly on the overlap
    — required by the solver's unit-consistency objective)."""
    rng = np.random.default_rng(seed)
    pair_offset_max = pair_offset_max if pair_offset_max is not None else seg_len

    utts: list[tuple[str, str, int]] = []
    with h5py.File(h5_path, "r") as f:
        if split not in f:
            raise ValueError(f"split {split!r} not in {h5_path}")
        for spk in f[split]:
            for utt in f[split][spk]:
                t = f[f"{split}/{spk}/{utt}/mel"].shape[0]
                if t >= seg_len + 1:
                    utts.append((spk, utt, t))
    if not utts:
        raise ValueError(f"no utterance in {h5_path}:{split} is >= {seg_len + 1} frames")

    entries = []
    choice = rng.integers(0, len(utts), n_samples)
    for i in choice:
        spk, utt, t = utts[i]
        t0 = int(rng.integers(0, t - seg_len + 1))
        lo = max(0, t0 - pair_offset_max)
        hi = min(t - seg_len, t0 + pair_offset_max)
        dmin = -((t0 - lo) // pair_grid)
        dmax = (hi - t0) // pair_grid
        t1 = t0 + pair_grid * int(rng.integers(dmin, dmax + 1))
        entries.append({"speaker": spk, "utt": utt, "t0": t0, "t1": t1})

    Path(index_path).parent.mkdir(parents=True, exist_ok=True)
    Path(index_path).write_text(json.dumps(entries))
    return entries
