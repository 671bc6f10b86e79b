"""Pallas kernel: whole Griffin-Lim iteration loop resident in VMEM.

The XLA fused-matmul Griffin-Lim (dsp.audio.griffin_lim) round-trips the
complex spectrogram through HBM every iteration. This kernel keeps the
carry, the DFT bases, and all temporaries in VMEM for the entire loop —
one kernel invocation = the whole vocoder.

Alignment trick that makes it matmuls + uniform shifts: with
``lead = n_fft//2 - (n_fft - win)//2`` divisible by hop (true for the
800/200/1024 default and the 256/64/256 test config), the analysis
segment of frame t over the UNTRIMMED overlap-add output starts exactly at
row t of the [.., hop] row view. Both DFT contractions are split per
hop-block so the kernel never concatenates misaligned tiles:

    synthesis:  chunk_k = S_re @ cs_k + S_im @ ss_k         (2r matmuls)
    overlap-add: acc = sum_k roll(pad(chunk_k), k, axis=0)   (r rolls)
    analysis:   re = sum_k rows[k:k+t] @ ca_k  (and im)      (2r matmuls)
    projection: S <- mag * (re, im) / |(re, im)|

Edge frames see the natural OLA tails instead of a reflect-pad of the
trimmed signal — magnitude-consistency matches the XLA path to 4 decimals.
Bases are bf16 (f32 accumulation). Sized for T <= 512 frames; the caller
falls back to the XLA path for longer utterances or misaligned configs.
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


def pallas_gl_supported(cfg: AudioConfig, n_frames: int) -> bool:
    lead = cfg.n_fft // 2 - (cfg.n_fft - cfg.win_length) // 2
    return (
        cfg.win_length % cfg.hop_length == 0
        and lead % cfg.hop_length == 0
        and n_frames <= 512
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _gl_constants(cfg: AudioConfig):
    """Per-hop-block bf16 bases: analysis ca_k/sa_k [hop, fp] stacked on a
    leading r axis, synthesis cs_k/ss_k [fp, hop] likewise."""
    ca, sa, cs, ss = dsp_audio._fused_bases(cfg)  # [win,F], [F,win]
    win, f = ca.shape
    hop = cfg.hop_length
    r = win // hop
    fp = _round_up(f, 128)

    def padf(m, shape):
        out = np.zeros(shape, np.float32)
        out[: m.shape[0], : m.shape[1]] = m
        return out

    ca_k = np.stack([padf(ca[k * hop : (k + 1) * hop], (hop, fp)) for k in range(r)])
    sa_k = np.stack([padf(sa[k * hop : (k + 1) * hop], (hop, fp)) for k in range(r)])
    cs_k = np.stack([padf(cs[:, k * hop : (k + 1) * hop], (fp, hop)) for k in range(r)])
    ss_k = np.stack([padf(ss[:, k * hop : (k + 1) * hop], (fp, hop)) for k in range(r)])
    bf = jnp.bfloat16
    return ca_k.astype(bf), sa_k.astype(bf), cs_k.astype(bf), ss_k.astype(bf)


@functools.lru_cache(maxsize=32)
def _wss_inv_rows(cfg: AudioConfig, t: int) -> np.ndarray:
    r = cfg.win_length // cfg.hop_length
    wss = dsp_audio._fused_wss(cfg, t)  # [(t-1+r)*hop]
    return (1.0 / wss).reshape(t - 1 + r, cfg.hop_length).astype(np.float32)


def _kernel(mag_ref, ca_ref, sa_ref, cs_ref, ss_ref, wi_ref, ore_ref, oim_ref,
            *, n_iters, r, hop, t, alpha):
    mag = mag_ref[:]  # [t, fp] f32 (cols >= n_freq are zero)

    def project(sre, sim):
        sre16, sim16 = sre.astype(jnp.bfloat16), sim.astype(jnp.bfloat16)
        # synthesis + overlap-add, one hop-block at a time
        acc = jnp.zeros((t - 1 + r, hop), jnp.float32)
        for k in range(r):
            chunk = jnp.dot(sre16, cs_ref[k], preferred_element_type=jnp.float32)
            chunk += jnp.dot(sim16, ss_ref[k], preferred_element_type=jnp.float32)
            cp = jnp.pad(chunk, ((0, r - 1), (0, 0)))  # uniform pad: same layout all k
            acc += pltpu.roll(cp, k, 0) if k else cp   # wrapped rows are the zero pad
        rows = acc * wi_ref[:]
        # analysis, contraction split per hop-block (no concat)
        re = jnp.zeros_like(mag)
        im = jnp.zeros_like(mag)
        for k in range(r):
            seg = jax.lax.slice(rows, (k, 0), (k + t, hop)).astype(jnp.bfloat16)
            re += jnp.dot(seg, ca_ref[k], preferred_element_type=jnp.float32)
            im += jnp.dot(seg, sa_ref[k], preferred_element_type=jnp.float32)
        norm = jnp.maximum(jnp.sqrt(re * re + im * im), 1e-8)
        return mag * re / norm, mag * im / norm

    def body(_, carry):
        cre, cim, tre, tim = carry
        nre, nim = project(cre, cim)
        return nre + alpha * (nre - tre), nim + alpha * (nim - tim), nre, nim

    zero = jnp.zeros_like(mag)
    cre, cim, _, _ = jax.lax.fori_loop(0, n_iters, body, (mag, zero, mag, zero))
    ore_ref[:], oim_ref[:] = project(cre, cim)


@functools.partial(jax.jit, static_argnames=("cfg", "n_iters", "interpret"))
def griffin_lim_pallas(
    mag: jnp.ndarray, cfg: AudioConfig, n_iters: int | None = None, interpret: bool | None = None
) -> jnp.ndarray:
    """Griffin-Lim with the whole iteration loop in one Pallas kernel;
    returns the time signal (final synthesis via the exact XLA iSTFT).
    Drop-in for dsp.audio.griffin_lim where pallas_gl_supported holds."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_iters = cfg.gl_iters if n_iters is None else n_iters
    t, f = mag.shape
    assert pallas_gl_supported(cfg, t), (t, cfg)
    r = cfg.win_length // cfg.hop_length
    ca_k, sa_k, cs_k, ss_k = _gl_constants(cfg)
    fp = ca_k.shape[2]
    if f < fp:
        mag = jnp.pad(mag, ((0, 0), (0, fp - f)))
    wi = jnp.asarray(_wss_inv_rows(cfg, t))

    kernel = functools.partial(
        _kernel, n_iters=n_iters, r=r, hop=cfg.hop_length, t=t, alpha=cfg.gl_momentum
    )
    ore, oim = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((t, fp), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mag, ca_k, sa_k, cs_k, ss_k, wi)

    return dsp_audio.istft(ore[:, :f], oim[:, :f], cfg, method="fused")
