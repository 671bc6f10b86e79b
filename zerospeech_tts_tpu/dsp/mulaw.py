"""8-bit mu-law companding for the host<->device PCM wire.

Conversion on tunneled / network-attached hosts is wire-bound, not
FLOP-bound (docs/performance.md): the int16 PCM wire moves ~6.6 MB per
16-utterance batch. Mu-law companding (the G.711 telephony codec's
continuous form, mu=255) halves both directions at ~38 dB SNR on speech
— far above the Griffin-Lim phase-reconstruction noise floor, and the
discrete MBV units are measurably unchanged (agreement recorded by
bench.py every run). The wire is OPT-IN (`Converter(pcm_wire="mulaw")`);
the default int16 wire stays bit-exact for PCM16 sources.

Design: the device side is branch-free f32 VPU math (log1p / exp2 —
fuses into the surrounding program); the host side is two precomputed
lookup tables (65536-entry int16->uint8 encode, 256-entry uint8->int16
decode) so companding costs one numpy gather per batch (~2 ms), not a
transcendental sweep over every sample.

Code layout: u = 128 + round(f * 127) with f = sign(y) * ln(1+mu|y|) /
ln(1+mu), so u=128 is EXACTLY zero (digital silence survives the wire)
and u spans [1, 255].
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

MU = 255.0
_LN1P_MU = float(np.log1p(MU))


def mulaw_compress_device(y: jnp.ndarray) -> jnp.ndarray:
    """float wav in [-1, 1] -> uint8 mu-law code (device side, f32 math)."""
    f = jnp.sign(y) * jnp.log1p(MU * jnp.abs(y)) * (1.0 / _LN1P_MU)
    return jnp.clip(jnp.round(f * 127.0) + 128.0, 1.0, 255.0).astype(jnp.uint8)


def mulaw_expand_device(u: jnp.ndarray) -> jnp.ndarray:
    """uint8 mu-law code -> float wav in [-1, 1] (device side, f32 math)."""
    # clip keeps the out-of-protocol code 0 (encode emits [1, 255]) in range
    f = jnp.clip((u.astype(jnp.float32) - 128.0) * (1.0 / 127.0), -1.0, 1.0)
    mag = (jnp.exp2(jnp.abs(f) * (_LN1P_MU / np.log(2.0))) - 1.0) * (1.0 / MU)
    return jnp.sign(f) * mag


@functools.lru_cache(maxsize=1)
def _encode_lut() -> np.ndarray:
    """int16 sample (offset by 32768) -> uint8 mu-law code, float64 math."""
    y = (np.arange(65536, dtype=np.float64) - 32768.0) / 32768.0
    f = np.sign(y) * np.log1p(MU * np.abs(y)) / _LN1P_MU
    return np.clip(np.round(f * 127.0) + 128.0, 1.0, 255.0).astype(np.uint8)


@functools.lru_cache(maxsize=1)
def _decode_lut() -> np.ndarray:
    """uint8 mu-law code -> int16 sample (load_wav 32768 scale)."""
    f = (np.arange(256, dtype=np.float64) - 128.0) / 127.0
    y = np.sign(f) * (np.power(1.0 + MU, np.abs(f)) - 1.0) / MU
    return np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)


def mulaw_compress_host(pcm16: np.ndarray) -> np.ndarray:
    """int16 PCM -> uint8 mu-law codes (one LUT gather)."""
    return _encode_lut()[pcm16.astype(np.int32) + 32768]


def mulaw_expand_host(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> int16 PCM (one LUT gather)."""
    return _decode_lut()[codes]
