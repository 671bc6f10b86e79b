"""Pallas kernel: the whole Griffin-Lim vocoder resident in VMEM.

The XLA fused-matmul Griffin-Lim (dsp.audio.griffin_lim) round-trips the
complex spectrogram through HBM every iteration. This kernel keeps the
iteration state, the DFT bases, and all temporaries in VMEM for the whole
loop and synthesizes the final signal in-kernel — one kernel invocation =
the complete vocoder (no trailing XLA iSTFT dispatch).

Signal-domain carry (the v2 design; round-1 carried four full spectra and
hit the VMEM ceiling at 512 frames): because the iSTFT is linear, fast-GL
momentum on spectra ``c_{i+1} = n_i + a (n_i - n_{i-1})`` maps exactly to
the same extrapolation on their SIGNALS, so the loop state is two
[t-1+r, hop] signal buffers (~1 MB at 1024 frames) instead of four
[t, n_freq] spectra (~10 MB). Spectra exist only as per-frame-tile
temporaries of the analysis->project->synthesis sweep. Exact-arithmetic
equivalence with the spectral loop:

    v_1 = istft(mag, 0)                u_0 = v_1
    repeat: (re,im) = stft(v_i);  n_i = mag * (re,im)/|..|
            u_i = istft(n_i);     v_{i+1} = u_i + a (u_i - u_{i-1})
    out    = istft(mag * phase(stft(v_{N+1})))

Alignment trick that makes stft/istft matmuls + uniform shifts: with
``lead = n_fft//2 - (n_fft - win)//2`` divisible by hop (true for the
800/200/1024 default and the 256/64/256 test config), the analysis
segment of frame t over the untrimmed overlap-add output starts exactly
at row t of the [.., hop] row view; both DFT contractions split per
hop-block (r = win//hop matmuls each way, roll-aligned overlap-add).

Edge frames see the natural OLA tails instead of a reflect-pad of the
trimmed signal — magnitude-consistency matches the XLA path to 4 decimals.
Bases are bf16 (f32 accumulation). Sized for T <= 1024 frames (12.8 s at
the 12.5 ms hop); the caller falls back to the XLA path beyond that or
for misaligned configs.
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

MAX_FRAMES = 1024


def pallas_gl_supported(cfg: AudioConfig, n_frames: int) -> bool:
    lead = cfg.n_fft // 2 - (cfg.n_fft - cfg.win_length) // 2
    return (
        cfg.win_length % cfg.hop_length == 0
        and lead % cfg.hop_length == 0
        and n_frames <= MAX_FRAMES
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


def _kernel(mag_ref, ca_ref, sa_ref, cs_ref, ss_ref, wi_ref, out_ref,
            v_ref, u_ref, acc_ref, *, n_iters, r, hop, t, tiles, alpha):
    bf = jnp.bfloat16

    def synth_tile(j0, ts, sre16, sim16):
        """Synthesis of one frame tile + roll-aligned local overlap-add,
        accumulated into acc_ref rows [j0, j0+ts+r-1). sim16=None skips the
        imaginary contribution (zero-phase init)."""
        accj = jnp.zeros((ts + r - 1, hop), jnp.float32)
        for k in range(r):
            chunk = jnp.dot(sre16, cs_ref[k], preferred_element_type=jnp.float32)
            if sim16 is not None:
                chunk += jnp.dot(sim16, ss_ref[k], preferred_element_type=jnp.float32)
            cp = jnp.pad(chunk, ((0, r - 1), (0, 0)))  # uniform pad: same layout all k
            accj += pltpu.roll(cp, k, 0) if k else cp  # wrapped rows are the zero pad
        acc_ref[j0 : j0 + ts + r - 1, :] += accj

    def analyze_tile(x16, j0, ts):
        """STFT of frames [j0, j0+ts) from the bf16 row-view signal."""
        re = jnp.zeros((ts, mag_ref.shape[1]), jnp.float32)
        im = jnp.zeros_like(re)
        for k in range(r):
            seg = jax.lax.slice(x16, (j0 + k, 0), (j0 + k + ts, hop))
            re += jnp.dot(seg, ca_ref[k], preferred_element_type=jnp.float32)
            im += jnp.dot(seg, sa_ref[k], preferred_element_type=jnp.float32)
        return re, im

    def sweep(x):
        """One analysis -> project -> synthesis pass over all frame tiles;
        leaves the un-normalized OLA in acc_ref."""
        acc_ref[:] = jnp.zeros_like(acc_ref)
        x16 = x.astype(bf)
        for j0, ts in tiles:
            re, im = analyze_tile(x16, j0, ts)
            norm = jnp.maximum(jnp.sqrt(re * re + im * im), 1e-8)
            m = mag_ref[j0 : j0 + ts, :]
            synth_tile(j0, ts, (m * re / norm).astype(bf), (m * im / norm).astype(bf))

    # v_1 = u_0 = istft(mag, zero phase)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for j0, ts in tiles:
        synth_tile(j0, ts, mag_ref[j0 : j0 + ts, :].astype(bf), None)
    v_ref[:] = acc_ref[:] * wi_ref[:]
    u_ref[:] = v_ref[:]

    def body(_, carry):
        sweep(v_ref[:])
        u_i = acc_ref[:] * wi_ref[:]
        v_ref[:] = u_i + alpha * (u_i - u_ref[:])
        u_ref[:] = u_i
        return carry

    jax.lax.fori_loop(0, n_iters, body, 0)

    # final projection + in-kernel synthesis: out = istft(P(v_{N+1}))
    sweep(v_ref[:])
    out_ref[:] = acc_ref[:] * wi_ref[:]


@functools.partial(jax.jit, static_argnames=("cfg", "n_iters", "interpret"))
def griffin_lim_pallas(
    mag: jnp.ndarray, cfg: AudioConfig, n_iters: int | None = None, interpret: bool | None = None
) -> jnp.ndarray:
    """Griffin-Lim with the whole vocoder (iterations + final synthesis) in
    one Pallas kernel; returns the time signal. Drop-in for
    dsp.audio.griffin_lim where pallas_gl_supported holds."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_iters = cfg.gl_iters if n_iters is None else n_iters
    t, f = mag.shape
    assert pallas_gl_supported(cfg, t), (t, cfg)
    hop = cfg.hop_length
    r = cfg.win_length // hop
    ca_k, sa_k, cs_k, ss_k = _gl_constants(cfg)
    fp = ca_k.shape[2]
    if f < fp:
        mag = jnp.pad(mag, ((0, 0), (0, fp - f)))
    wi = jnp.asarray(_wss_inv_rows(cfg, t))

    # frame tiles bound the transient spectral buffers to [tb, fp]
    # (on-chip A/B at t=1024, batch 8: tb=512 6.4 ms/utt vs tb=256 7.0)
    tb = min(t, 512)
    tiles = tuple((j0, min(tb, t - j0)) for j0 in range(0, t, tb))
    rows = t - 1 + r

    kernel = functools.partial(
        _kernel, n_iters=n_iters, r=r, hop=hop, t=t, tiles=tiles, alpha=cfg.gl_momentum
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, hop), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, hop), jnp.float32),  # v: istft(c_i)
            pltpu.VMEM((rows, hop), jnp.float32),  # u: istft(n_{i-1})
            pltpu.VMEM((rows, hop), jnp.float32),  # acc: OLA accumulator
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mag, ca_k, sa_k, cs_k, ss_k, wi)

    # librosa istft span: drop the centering lead, cut to (t-1)*hop samples
    lead = cfg.n_fft // 2 - (cfg.n_fft - cfg.win_length) // 2
    return out.reshape(-1)[lead : lead + (t - 1) * hop]
