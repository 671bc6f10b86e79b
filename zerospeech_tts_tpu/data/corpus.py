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
    n_shards: int = 1,
    shard_index: int = 0,
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

    Sharded build (SURVEY.md §7 hard-part 6): with ``n_shards > 1`` this
    process handles the deterministic slice ``paths[shard_index::n_shards]``
    of every split and writes RAW per-speaker stat partials
    (``stats_raw/{spk}/{feat}_{n,s1,s2}``) instead of finalized stats —
    the segmented-reduction partial sums a later
    :func:`merge_corpus_shards` combines exactly. Each shard is an
    independent process (or host); nothing is shared but the output files.

    Returns a manifest dict: speakers id-map + per-split utterance counts.
    """
    import collections
    import queue as queue_mod
    import threading

    if not (0 <= shard_index < n_shards):
        raise ValueError(f"shard_index {shard_index} not in [0, {n_shards})")
    found = discover_wavs(corpus_dir)
    if n_shards > 1:
        found = {s: paths[shard_index::n_shards] for s, paths in found.items()}
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

        if n_shards > 1:
            # raw partials: the merge step's segmented reduction needs the
            # (n, sum, sum-of-squares) triples, not per-shard means
            for feat, stats in (("mel", mel_stats), ("lin", lin_stats)):
                for spk, st in stats.items():
                    g = f.require_group(f"stats_raw/{spk}")
                    g.create_dataset(f"{feat}_n", data=np.int64(st.n))
                    g.create_dataset(f"{feat}_s1", data=st.s1)
                    g.create_dataset(f"{feat}_s2", data=st.s2)
            f.attrs["shard"] = json.dumps({"index": shard_index, "of": n_shards})
        else:
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


def merge_corpus_shards(shard_paths: Iterable[str | Path], out_h5: str | Path) -> dict:
    """Combine shard files from :func:`build_corpus`'s sharded mode into
    one corpus h5 — the cross-host half of SURVEY.md §7 hard-part 6.

    Feature groups are copied verbatim; per-speaker stats come from the
    exact segmented reduction over the shards' raw ``(n, s1, s2)``
    partials (identical math to the single-process accumulator, so the
    merged mean/std equal a single-process build's up to float64 sum
    reassociation — tested at 1e-10 in tests/test_data.py). The merged
    speaker id-map is assigned in sorted-name order: deterministic no
    matter how utterances were partitioned (a single-process build uses
    encounter order instead; ids are file-internal either way).
    """
    shard_paths = [Path(p) for p in shard_paths]
    if not shard_paths:
        raise ValueError("no shard files given")
    out_h5 = Path(out_h5)
    out_h5.parent.mkdir(parents=True, exist_ok=True)
    counts: dict[str, int] = {}
    raw: dict[str, dict[str, list]] = {}
    speakers_seen: set[str] = set()
    acfg_json = None
    with h5py.File(out_h5, "w") as out:
        for sp in shard_paths:
            with h5py.File(sp, "r") as fin:
                if "shard" not in fin.attrs:
                    raise ValueError(f"{sp} is not a shard file (built with n_shards>1)")
                cj = fin.attrs.get("audio_config")
                if acfg_json is None:
                    acfg_json = cj
                elif cj != acfg_json:
                    raise ValueError(f"{sp}: audio_config differs across shards")
                speakers_seen.update(json.loads(fin.attrs["speakers"]))
                for split in fin:
                    if split in ("stats", "stats_raw"):
                        continue
                    for spk in fin[split]:
                        dst = out.require_group(f"{split}/{spk}")
                        for utt in fin[split][spk]:
                            if utt in dst:
                                raise ValueError(
                                    f"duplicate utterance {split}/{spk}/{utt} "
                                    f"across shards (overlapping partitions?)"
                                )
                            fin.copy(fin[f"{split}/{spk}/{utt}"], dst, name=utt)
                            counts[split] = counts.get(split, 0) + 1
                if "stats_raw" in fin:
                    for spk in fin["stats_raw"]:
                        g = fin[f"stats_raw/{spk}"]
                        acc = raw.setdefault(spk, {})
                        for feat in ("mel", "lin"):
                            if f"{feat}_n" not in g:
                                continue
                            a = acc.setdefault(feat, [0, None, None])
                            a[0] += int(g[f"{feat}_n"][()])
                            s1 = g[f"{feat}_s1"][:].astype(np.float64)
                            s2 = g[f"{feat}_s2"][:].astype(np.float64)
                            a[1] = s1 if a[1] is None else a[1] + s1
                            a[2] = s2 if a[2] is None else a[2] + s2
        for spk, feats in raw.items():
            g = out.require_group(f"stats/{spk}")
            for feat, (n, s1, s2) in feats.items():
                mean = s1 / max(n, 1)
                var = np.maximum(s2 / max(n, 1) - mean**2, 1e-12)
                g.create_dataset(f"{feat}_mean", data=mean.astype(np.float32))
                g.create_dataset(f"{feat}_std", data=np.sqrt(var).astype(np.float32))
        speakers = {s: i for i, s in enumerate(sorted(speakers_seen))}
        out.attrs["speakers"] = json.dumps(speakers)
        if acfg_json is not None:
            out.attrs["audio_config"] = acfg_json
    return {"speakers": speakers, "counts": counts, "path": str(out_h5)}


def load_speaker_map(h5_path: str | Path) -> dict[str, int]:
    with h5py.File(h5_path, "r") as f:
        return json.loads(f.attrs["speakers"])
