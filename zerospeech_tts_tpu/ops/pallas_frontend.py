"""Pallas kernel: fused spectrogram frontend.

One kernel computes, per tile of STFT frames, the entire reference
preprocess math after framing (ref preprocess.py get_spectrograms:
window+DFT -> |mag| -> mel -> dB -> [0,1] norm; SURVEY.md §3.1):

    re  = seg @ (win * cos)      [tile, win] x [win, n_freq]   (MXU)
    im  = seg @ (win * -sin)                                    (MXU)
    mag = sqrt(re^2 + im^2)                                     (VPU)
    mel = mag @ mel_basis^T      [tile, n_freq] x [n_freq, n_mels] (MXU)
    out = clip((20*log10(max(1e-5, .)) - ref + max) / max, 1e-8, 1)  (VPU)

The window is folded into the DFT bases (see dsp.audio._fused_bases), so
the kernel's inputs are raw hop-aligned signal segments. Everything stays
in VMEM between the three matmuls — the intermediate [tile, n_freq]
re/im/mag tensors never touch HBM, which is the fusion XLA does not do
across the dot boundaries.

Frequency/mel dims are zero-padded to lane multiples (128) on the host;
padding columns produce log10(1e-5)-floor values that are sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zerospeech_tts_tpu.config import AudioConfig
from zerospeech_tts_tpu.dsp import audio as dsp_audio


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _padded_constants(cfg: AudioConfig):
    """(ca, sa, melT) padded to lane-aligned shapes."""
    ca, sa, _, _ = dsp_audio._fused_bases(cfg)
    mel = dsp_audio._mel_basis(cfg)  # [n_mels, n_freq]
    win = ca.shape[0]
    f_pad = _round_up(cfg.n_freq, 128)
    m_pad = _round_up(cfg.n_mels, 128)
    w_pad = _round_up(win, 128)
    ca_p = np.zeros((w_pad, f_pad), np.float32)
    sa_p = np.zeros((w_pad, f_pad), np.float32)
    ca_p[:win, : cfg.n_freq] = ca
    sa_p[:win, : cfg.n_freq] = sa
    melT_p = np.zeros((f_pad, m_pad), np.float32)
    melT_p[: cfg.n_freq, : cfg.n_mels] = mel.T
    return ca_p, sa_p, melT_p


def _kernel(seg_ref, ca_ref, sa_ref, mel_ref, mel_out_ref, mag_out_ref, *, ref_db, max_db):
    seg = seg_ref[:]
    re = jnp.dot(seg, ca_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    im = jnp.dot(seg, sa_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)

    def db_norm(x):
        db = 20.0 * jnp.log10(jnp.maximum(1e-5, x))
        return jnp.clip((db - ref_db + max_db) / max_db, 1e-8, 1.0)

    mag_out_ref[:] = db_norm(mag)
    mel_out_ref[:] = db_norm(mel)


def fused_frontend_pallas(
    segments: jnp.ndarray, cfg: AudioConfig, tile: int = 256, interpret: bool | None = None
):
    """[T, win_length] hop-aligned signal segments -> (mel[T, n_mels],
    mag[T, n_freq]), both dB-normalized. T must be a multiple of ``tile``
    (the corpus builder's frame buckets are multiples of 64; pad to tile).

    interpret=None auto-selects interpreter mode off-TPU so tests run on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, win = segments.shape
    ca_p, sa_p, melT_p = _padded_constants(cfg)
    w_pad, f_pad = ca_p.shape
    m_pad = melT_p.shape[1]
    if win < w_pad:
        segments = jnp.pad(segments, ((0, 0), (0, w_pad - win)))
    t_pad = _round_up(t, tile)
    if t_pad > t:
        segments = jnp.pad(segments, ((0, t_pad - t), (0, 0)))

    grid = (t_pad // tile,)
    mel_out, mag_out = pl.pallas_call(
        functools.partial(_kernel, ref_db=cfg.ref_db, max_db=cfg.max_db),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, f_pad), jnp.float32),
        ],
        interpret=interpret,
    )(segments, jnp.asarray(ca_p), jnp.asarray(sa_p), jnp.asarray(melT_p))
    return mel_out[:t, : cfg.n_mels], mag_out[:t, : cfg.n_freq]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def wav_to_features_pallas(
    y: jnp.ndarray, cfg: AudioConfig, interpret: bool | None = None, length=None
):
    """Full frontend with the Pallas core: preemphasis + static-slice
    framing feed the fused kernel. Drop-in parity with
    dsp.audio.wav_to_features(method='fused'), including the dynamic
    true-``length`` reflection semantics for bucket-padded signals."""
    yp = dsp_audio.preemphasis(y, cfg.preemphasis)
    segs = dsp_audio._fused_segments(yp, cfg, length)
    return fused_frontend_pallas(segs, cfg, interpret=interpret)
