"""Host data loader (ref dataloader.py:~1-150, SURVEY.md §2 "Data loader").

h5-backed segment dataset yielding ``[B, seg_len, n_feat]`` float batches +
speaker ids, with the reference's same-utterance segment pairs (``x2``) and
the stage-2 extras (``x_real``/``spk_real`` drawn from the target-voice
speakers). Utterance feature arrays are cached in RAM (LRU) so steady-state
batch assembly is pure numpy gathers; a background prefetch thread keeps
one batch ahead of the device.

When a ``sharding`` is supplied, batches are device_put with that
NamedSharding so the jitted train step consumes them without host sync —
that placement (batch axis over the 'data' mesh axis) is the DP story
(SURVEY.md §2 parallelism row).
"""

from __future__ import annotations

import json
import queue
import threading
from pathlib import Path

import h5py
import jax
import numpy as np

from zerospeech_tts_tpu.config import Hps


class SegmentLoader:
    def __init__(
        self,
        h5_path: str | Path,
        index_path: str | Path,
        hps: Hps,
        feat: str = "lin",
        split: str = "train",
        target_speakers: list[str] | None = None,
        sharding=None,
        seed: int = 0,
        cache_size: int = 1024,
        prefetch: int = 2,
        pairs: bool = False,  # also yield the same-utterance pair segment x2
    ):
        self.pairs = pairs
        self.h5_path = str(h5_path)
        self.hps = hps
        self.feat = feat
        self.split = split
        self.sharding = sharding
        self.rng = np.random.default_rng(seed)
        self.entries = json.loads(Path(index_path).read_text())
        if not self.entries:
            raise ValueError(f"empty segment index {index_path}")
        if pairs:
            # the solver's pair objective floor-divides pair_dt by the
            # downsample; off-grid offsets silently misalign the compared
            # latents (an index built without pair_grid=hps.downsample)
            dts = np.array([e["t1"] - e["t0"] for e in self.entries])
            if (dts % hps.downsample).any():
                raise ValueError(
                    f"segment index {index_path} has pair offsets off the "
                    f"downsample={hps.downsample} grid — rebuild it with "
                    f"`zstts preprocess` (make_segment_index pair_grid="
                    f"hps.downsample), or pass pairs=False / --no-pairs"
                )
        self._f = h5py.File(self.h5_path, "r")
        self.speakers: dict[str, int] = json.loads(self._f.attrs["speakers"])
        from zerospeech_tts_tpu.data.device_dataset import check_speaker_ids

        check_speaker_ids(self.speakers, hps)
        self._cache: dict[tuple[str, str], np.ndarray] = {}
        self._cache_size = cache_size
        self.stats = None
        if hps.speaker_norm:
            from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats

            self.stats = SpeakerStats.load(self.h5_path, feat)

        tgt = set(target_speakers or [])
        self._real_entries = [e for e in self.entries if e["speaker"] in tgt] or self.entries

        self._q: queue.Queue | None = None
        self._prefetch = prefetch
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def reseed(self, offset: int) -> None:
        """Re-key the sampling stream (call with the restored step on
        resume, so a resumed run continues with fresh batches instead of
        replaying the already-consumed sequence from position 0)."""
        self.rng = np.random.default_rng(
            np.random.SeedSequence([self.hps.seed, int(offset)])
        )

    # ------------------------------------------------------------- access

    def _utt(self, spk: str, utt: str) -> np.ndarray:
        key = (spk, utt)
        arr = self._cache.get(key)
        if arr is None:
            arr = self._f[f"{self.split}/{spk}/{utt}/{self.feat}"][:]
            if arr.shape[1] != self.hps.n_feat:
                raise ValueError(
                    f"hps.n_feat={self.hps.n_feat} but corpus {self.feat!r} features "
                    f"have {arr.shape[1]} bins — check --feat / hps"
                )
            if len(self._cache) >= self._cache_size:
                self._cache.pop(next(iter(self._cache)))
            self._cache[key] = arr
        return arr

    def _segment(self, e: dict, t_key: str = "t0") -> np.ndarray:
        arr = self._utt(e["speaker"], e["utt"])
        t0 = e[t_key]
        seg = arr[t0 : t0 + self.hps.seg_len]
        if self.stats is not None:
            seg = self.stats.normalize(seg, e["speaker"])
        return seg

    def _assemble(self) -> dict:
        h = self.hps
        idx = self.rng.integers(0, len(self.entries), h.batch_size)
        x = np.stack([self._segment(self.entries[i]) for i in idx])
        spk = np.array([self.speakers[self.entries[i]["speaker"]] for i in idx], np.int32)

        ridx = self.rng.integers(0, len(self._real_entries), h.batch_size)
        x_real = np.stack([self._segment(self._real_entries[i]) for i in ridx])
        spk_real = np.array(
            [self.speakers[self._real_entries[i]["speaker"]] for i in ridx], np.int32
        )
        batch = {
            "x": x.astype(np.float32),
            "spk": spk,
            "x_real": x_real.astype(np.float32),
            "spk_real": spk_real,
        }
        if self.pairs:  # reference same-utterance pair contract
            batch["x2"] = np.stack(
                [self._segment(self.entries[i], "t1") for i in idx]
            ).astype(np.float32)
            batch["pair_dt"] = np.array(
                [self.entries[i]["t1"] - self.entries[i]["t0"] for i in idx], np.int32
            )
        if self.sharding is not None:
            batch = jax.device_put(batch, self.sharding)
        return batch

    # ----------------------------------------------------------- iteration

    def _worker(self):
        while not self._stop.is_set():
            try:
                b = self._assemble()
            except BaseException as e:  # propagate to the consumer, don't hang it
                b = e
            while not self._stop.is_set():
                try:
                    self._q.put(b, timeout=0.5)
                    break
                except queue.Full:
                    continue
            if isinstance(b, BaseException):
                return

    def __iter__(self):
        if self._prefetch > 0 and self._thread is None:
            self._q = queue.Queue(maxsize=self._prefetch)
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        return self

    def __next__(self) -> dict:
        if self._thread is not None:
            b = self._q.get()
            if isinstance(b, BaseException):
                raise b
            return b
        return self._assemble()

    def close(self):
        self._stop.set()
        if self._thread is not None:
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=2.0)
            self._thread = None
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
