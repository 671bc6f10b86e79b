"""Per-speaker feature normalization (SURVEY.md §2 "Per-speaker
normalization": BASELINE.json pins per-speaker statistics in the reference
preprocess; mechanism graded M — applied at load/convert time).

Stats are accumulated by the corpus builder (data/corpus.py) into
``stats/{speaker}/{mel,lin}_{mean,std}``. This module turns them into a
z-norm applied on top of the dB [0,1] normalization: training consumes
``(x - mean_spk) / std_spk``; conversion denormalizes decoder output with
the TARGET speaker's stats before Griffin-Lim. Unseen (test) speakers fall
back to the global train statistics. Enabled by ``Hps.speaker_norm``.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

GLOBAL_KEY = "__global__"


class SpeakerStats:
    """mean/std per speaker (+ global fallback) for one feature kind."""

    def __init__(self, mean: dict[str, np.ndarray], std: dict[str, np.ndarray]):
        self.mean = mean
        self.std = std
        assert GLOBAL_KEY in mean, "global fallback stats missing"

    @classmethod
    def load(cls, h5_path: str | Path, feat: str = "lin") -> "SpeakerStats":
        mean, std = {}, {}
        with h5py.File(h5_path, "r") as f:
            if "stats" not in f:
                raise ValueError(f"no stats group in {h5_path}; rebuild the corpus")
            for spk in f["stats"]:
                mean[spk] = f[f"stats/{spk}/{feat}_mean"][:]
                std[spk] = np.maximum(f[f"stats/{spk}/{feat}_std"][:], 1e-4)
        if GLOBAL_KEY not in mean:
            # derive a fallback from the speaker average (older corpora)
            mean[GLOBAL_KEY] = np.mean(list(mean.values()), axis=0)
            std[GLOBAL_KEY] = np.mean(list(std.values()), axis=0)
        return cls(mean, std)

    def get(self, speaker: str) -> tuple[np.ndarray, np.ndarray]:
        if speaker in self.mean:
            return self.mean[speaker], self.std[speaker]
        return self.mean[GLOBAL_KEY], self.std[GLOBAL_KEY]

    def normalize(self, feats: np.ndarray, speaker: str) -> np.ndarray:
        m, s = self.get(speaker)
        return (feats - m) / s

    def denormalize(self, feats: np.ndarray, speaker: str) -> np.ndarray:
        m, s = self.get(speaker)
        return feats * s + m

    def arrays_for(self, speakers: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Stacked [n, F] mean/std for a speaker list (jit-friendly)."""
        ms = [self.get(s) for s in speakers]
        return (
            np.stack([m for m, _ in ms]).astype(np.float32),
            np.stack([s for _, s in ms]).astype(np.float32),
        )
