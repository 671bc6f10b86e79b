"""ctypes bindings for the native corpus decoder (native/wav_reader.cpp).

The corpus-build loop is the preprocess hot path (SURVEY.md §3.1 — hours of
CPU in the reference). ``load_and_trim`` decodes + trims one utterance in a
single native call; :mod:`zerospeech_tts_tpu.dsp.wavio` is both the
fallback (when the .so isn't built) and the correctness oracle (tests
assert parity). Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATHS = [
    Path(__file__).resolve().parents[2] / "native" / "build" / "libwavreader.so",
    Path(__file__).resolve().parent / "libwavreader.so",
]

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.wr_decode.restype = ctypes.c_int
            lib.wr_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.wr_trim.restype = ctypes.c_int
            lib.wr_trim.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_float,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


_MAX_SECONDS = 600


def load_wav_native(path: str | Path, sr: int) -> np.ndarray | None:
    """Decode to mono float32 at ``sr``; None if the library is missing.
    Raises on decode errors (corrupt/unsupported files)."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(sr * _MAX_SECONDS, dtype=np.float32)
    n = lib.wr_decode(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.shape[0],
        sr,
    )
    if n < 0:
        raise ValueError(f"native wav decode failed ({n}) for {path}")
    return buf[:n].copy()


def trim_native(y: np.ndarray, top_db: float, frame_length=2048, hop_length=512):
    """Native trim bounds; None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, dtype=np.float32)
    s = ctypes.c_int64()
    e = ctypes.c_int64()
    lib.wr_trim(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.shape[0],
        top_db,
        frame_length,
        hop_length,
        ctypes.byref(s),
        ctypes.byref(e),
    )
    return y[s.value : e.value]


def load_and_trim(path: str | Path, sr: int, top_db: float | None) -> np.ndarray:
    """Native decode+trim, falling back to the scipy path when the library
    is missing OR the native decode fails (overlong file, exotic format)."""
    from zerospeech_tts_tpu.dsp.wavio import load_wav, trim_silence

    y = None
    if available():
        try:
            y = load_wav_native(path, sr)
        except ValueError:
            y = None  # scipy fallback below
    if y is None:
        y = load_wav(path, sr)
    if top_db is not None:
        t = trim_native(y, top_db) if available() else None
        y = t if t is not None else trim_silence(y, top_db)
    return y
