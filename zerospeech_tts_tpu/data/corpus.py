"""Corpus builder (ref make_datasets.py:~1-80 / preprocess.py main loop;
SURVEY.md §3.1).

Walks the ZeroSpeech'19 layout::

    <corpus>/train/unit/*.wav      # unit-discovery speakers
    <corpus>/train/voice/*.wav     # target voices (V001, V002)
    <corpus>/train/parallel/**     # optional parallel data
    <corpus>/test/*.wav

Speaker identity comes from the filename prefix (``S015_0361841101.wav`` ->
``S015``), or from the parent directory when wavs are grouped in per-speaker
folders. Each wav goes through trim -> jitted frontend (mel+lin features,
length-bucketed so the whole corpus compiles a handful of XLA programs) and
is written to h5 as ``{split}/{speaker}/{utt}/{mel,lin}``.

Per-speaker normalization statistics (BASELINE.json pins these in the
reference preprocess) are accumulated in one pass and stored under
``stats/{speaker}`` alongside a ``speakers`` id-map attribute.

The wav decode loop is embarrassingly parallel over utterances; a native
C++ decoder (native/wav_reader.cpp) accelerates it when built, with
:mod:`zerospeech_tts_tpu.dsp.wavio` as the portable fallback/oracle.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Iterable

import h5py
import numpy as np

from zerospeech_tts_tpu.config import AudioConfig
from zerospeech_tts_tpu.dsp import audio as dsp_audio
from zerospeech_tts_tpu.data import native as native_io

_SPK_RE = re.compile(r"^([A-Za-z]+\d+)[_-]")


def speaker_of(path: Path) -> str:
    """Speaker id: filename prefix (challenge layout) or parent dir name."""
    m = _SPK_RE.match(path.stem)
    if m:
        return m.group(1)
    return path.parent.name


def discover_wavs(corpus_dir: str | Path) -> dict[str, list[Path]]:
    """Map split name -> wav paths. Splits: train (unit+voice+parallel
    merged, as the reference trains on all of train/) and test."""
    corpus = Path(corpus_dir)
    splits: dict[str, list[Path]] = {}
    train = sorted((corpus / "train").rglob("*.wav")) if (corpus / "train").exists() else []
    test = sorted((corpus / "test").rglob("*.wav")) if (corpus / "test").exists() else []
    if not train and not test:
        # treat a flat directory of wavs as a train split
        train = sorted(corpus.rglob("*.wav"))
    if train:
        splits["train"] = train
    if test:
        splits["test"] = test
    return splits


class _SpeakerStats:
    """Single-pass per-speaker mean/std accumulator over feature frames."""

    def __init__(self):
        self.n = 0
        self.s1: np.ndarray | None = None
        self.s2: np.ndarray | None = None

    def update(self, feats: np.ndarray) -> None:
        if self.s1 is None:
            self.s1 = np.zeros(feats.shape[1], np.float64)
            self.s2 = np.zeros(feats.shape[1], np.float64)
        self.n += feats.shape[0]
        self.s1 += feats.sum(axis=0, dtype=np.float64)
        self.s2 += (feats.astype(np.float64) ** 2).sum(axis=0)

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        mean = self.s1 / max(self.n, 1)
        var = np.maximum(self.s2 / max(self.n, 1) - mean**2, 1e-12)
        return mean.astype(np.float32), np.sqrt(var).astype(np.float32)


def build_corpus(
    corpus_dir: str | Path,
    out_h5: str | Path,
    cfg: AudioConfig,
    splits: Iterable[str] = ("train", "test"),
    bucket_frames: int = 64,
    trim: bool = True,
    progress=None,
    pipeline: int = 3,
) -> dict:
    """Extract features for every wav and write the h5 corpus.

    The hot loop is a three-stage pipeline: a producer thread decodes and
    trims wavs (native C++ fast path) while the main thread dispatches the
    jitted frontend and defers device->host readback by ``pipeline``
    utterances — JAX's async dispatch then overlaps decode, device
    compute, and both transfer directions instead of paying a full
    dispatch+readback round-trip per utterance (the reference's corpus
    loop is serial and CPU-bound for hours; SURVEY.md §3.1 🔥).
    ``pipeline=0`` restores the fully synchronous loop.

    Returns a manifest dict: speakers id-map + per-split utterance counts.
    """
    import collections
    import queue as queue_mod
    import threading

    found = discover_wavs(corpus_dir)
    out_h5 = Path(out_h5)
    out_h5.parent.mkdir(parents=True, exist_ok=True)

    speakers: dict[str, int] = {}
    counts: dict[str, int] = {}
    mel_stats: dict[str, _SpeakerStats] = {}
    lin_stats: dict[str, _SpeakerStats] = {}

    with h5py.File(out_h5, "w") as f:

        def write_out(split, path, spk, mel_d, lin_d):
            mel, lin = np.asarray(mel_d), np.asarray(lin_d)  # sync point
            grp = f.require_group(f"{split}/{spk}/{path.stem}")
            grp.create_dataset("mel", data=mel, dtype=np.float32)
            grp.create_dataset("lin", data=lin, dtype=np.float32)
            counts[split] = counts.get(split, 0) + 1
            if split == "train":
                mel_stats.setdefault(spk, _SpeakerStats()).update(mel)
                lin_stats.setdefault(spk, _SpeakerStats()).update(lin)
                mel_stats.setdefault("__global__", _SpeakerStats()).update(mel)
                lin_stats.setdefault("__global__", _SpeakerStats()).update(lin)
            if progress:
                progress(split, str(path))

        for split in splits:
            paths = found.get(split, [])
            q: queue_mod.Queue = queue_mod.Queue(maxsize=max(2 * pipeline, 2))
            stop = threading.Event()  # consumer death must unblock q.put

            def producer(paths=paths, q=q, stop=stop):
                def put(item) -> bool:
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            return True
                        except queue_mod.Full:
                            continue
                    return False

                try:
                    for path in paths:
                        # native C++ decode+trim fast path, scipy fallback
                        y = native_io.load_and_trim(path, cfg.sr, cfg.top_db if trim else None)
                        if not put((path, y)):
                            return
                except BaseException as e:  # surface in the consumer
                    put(e)
                    return
                put(None)

            th = threading.Thread(target=producer, daemon=True)
            th.start()
            pending: collections.deque = collections.deque()
            try:
                while True:
                    item = q.get()
                    if item is None:
                        break
                    if isinstance(item, BaseException):
                        raise item
                    path, y = item
                    spk = speaker_of(path)
                    speakers.setdefault(spk, len(speakers))
                    if len(y) < cfg.hop_length:
                        continue
                    mel_d, lin_d = dsp_audio.get_spectrograms(
                        y, cfg, bucket_frames=bucket_frames, sync=False
                    )
                    pending.append((path, spk, mel_d, lin_d))
                    if len(pending) > pipeline:
                        write_out(split, *pending.popleft())
                while pending:
                    write_out(split, *pending.popleft())
            finally:
                stop.set()
                th.join(timeout=5.0)

        for spk, st in mel_stats.items():
            mean, std = st.finalize()
            g = f.require_group(f"stats/{spk}")
            g.create_dataset("mel_mean", data=mean)
            g.create_dataset("mel_std", data=std)
        for spk, st in lin_stats.items():
            mean, std = st.finalize()
            g = f.require_group(f"stats/{spk}")
            g.create_dataset("lin_mean", data=mean)
            g.create_dataset("lin_std", data=std)

        f.attrs["speakers"] = json.dumps(speakers)
        f.attrs["audio_config"] = json.dumps(
            {k: v for k, v in cfg.__dict__.items()}, default=float
        )

    return {"speakers": speakers, "counts": counts, "path": str(out_h5)}


def load_speaker_map(h5_path: str | Path) -> dict[str, int]:
    with h5py.File(h5_path, "r") as f:
        return json.loads(f.attrs["speakers"])
