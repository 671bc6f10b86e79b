"""Pallas kernel: the whole Griffin-Lim vocoder resident in VMEM.

The XLA fused-matmul Griffin-Lim (dsp.audio.griffin_lim) round-trips the
complex spectrogram through HBM every iteration. This kernel keeps the
iteration state, the DFT bases, and all temporaries in VMEM for the whole
loop and synthesizes the final signal in-kernel — one kernel invocation =
the complete vocoder (no trailing XLA iSTFT dispatch).

Signal-domain carry (v2; round-1 carried four full spectra and hit the
VMEM ceiling at 512 frames): because the iSTFT is linear, fast-GL
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

Streaming magnitudes (v3): beyond 1024 frames the [t, fp] f32 magnitude
no longer fits VMEM next to the working set, so it stays in HBM and each
sweep double-buffers [tile, fp] slices in via async DMA (SURVEY.md §5
long-context: blockwise kernels stream arbitrary utterances through
VMEM). The OLA normalization envelope is stored in its exact compact
form — [r-1] head rows + ONE repeated interior row + [r-1] tail rows
(the window-square sum is hop-periodic away from the edges) — so its
VMEM cost is O(r·hop) instead of O(t·hop). VMEM-carry ceiling: 2048
frames (25.6 s at the 12.5 ms hop).

Streaming signal carries (v4): beyond 2048 frames the v/u carries move
to HBM as well (kernel outputs in ANY space) and each sweep becomes a
dynamic ``fori_loop`` over frame tiles — per tile, DMA in the v rows +
magnitude + u_prev, analyze/project/synthesize in VMEM, and because
tiles run in ascending order the tile's own OLA rows are final the
moment it finishes, so normalization + momentum extrapolation fuse into
the same pass and the freshly-extrapolated v rows DMA straight back out
(the r-1 overlap rows ride the loop carry). VMEM is O(tile) regardless
of length; one tile body compiles once. Mosaic alignment: the lane dim
is hop zero-padded to a 128 multiple (the padded columns are exactly
zero through every sweep) and the overlap carry is sublane-padded to 8
rows. Ceiling: 32768 frames (~6.8 min); consistency matches the XLA
path and the ≤2048 kernels to float tolerance.

Alignment trick that makes stft/istft matmuls + uniform shifts: with
``lead = n_fft//2 - (n_fft - win)//2`` divisible by hop (true for the
800/200/1024 default and the 256/64/256 test config), the analysis
segment of frame t over the untrimmed overlap-add output starts exactly
at row t of the [.., hop] row view; both DFT contractions split per
hop-block (r = win//hop matmuls each way, roll-aligned overlap-add).

Edge frames see the natural OLA tails instead of a reflect-pad of the
trimmed signal — magnitude-consistency matches the XLA path to 4 decimals.
Bases are bf16 (f32 accumulation).
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

MAX_FRAMES = 2048  # v3 ceiling: VMEM-resident signal carries
STREAM_THRESHOLD = 1024  # above this, magnitudes stream from HBM per tile
V4_TILE = 256  # v4 frame tile (dynamic fori_loop grid over tiles)
MAX_FRAMES_V4 = 32768  # v4: HBM-resident carries; ~6.8 min at the 12.5 ms hop


def pallas_gl_supported(cfg: AudioConfig, n_frames: int) -> bool:
    lead = cfg.n_fft // 2 - (cfg.n_fft - cfg.win_length) // 2
    r = cfg.win_length // max(cfg.hop_length, 1)
    return (
        cfg.win_length % cfg.hop_length == 0
        and lead % cfg.hop_length == 0
        and r >= 2
        # compact-envelope slicing + the hop-periodic interior row need at
        # least one fully-overlapped OLA region
        and n_frames >= 2 * r
        and n_frames <= MAX_FRAMES_V4
    )


def pallas_gl_vmap_supported(cfg: AudioConfig, n_frames: int) -> bool:
    """Whether the kernel can sit under jax.vmap (the converter batches
    the vocoder per utterance): the streaming path keeps magnitudes in
    ANY/HBM memory, which Pallas cannot batch with a non-trivial index
    map — so vmapped callers are capped at the all-VMEM threshold."""
    return pallas_gl_supported(cfg, n_frames) and n_frames <= STREAM_THRESHOLD


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gl_packed(cfg: AudioConfig) -> bool:
    """Real-FFT Nyquist packing: with an even n_fft the DC and Nyquist bins
    are purely real (their sin analysis columns / synthesis rows are exact
    zeros up to ~1e-13 construction residue), so the Nyquist bin folds into
    the imaginary channel of column 0 and the matmul lane width becomes
    F-1 instead of F rounded up to the next 128 multiple. For the flagship
    1024-FFT that is 512 lanes instead of 640 — 20% fewer MXU cycles on
    EVERY Griffin-Lim matmul (the kernel is ~93% of conversion FLOPs).
    Enabled only when F-1 is itself 128-aligned so the Nyquist magnitude
    (kept at its original column F-1 = first padded lane) stays on an
    aligned lane-slice boundary.

    NOTE: packing changes the kernel's numerical results at float-tolerance
    level (the real-bin projection normalizes by |re| instead of
    sqrt(re^2 + residual^2), a ~1e-13-residue-level difference) — so
    bit-reproducibility comparisons across repo versions will see the
    vocoder output shift. Escape hatch for A/B debugging: set
    ZSTTS_GL_NO_PACK=1 in the environment BEFORE the first kernel build
    (the constant builders are lru-cached; flipping it mid-process is
    not supported)."""
    import os

    if os.environ.get("ZSTTS_GL_NO_PACK"):
        return False
    f = cfg.n_fft // 2 + 1
    return cfg.n_fft % 2 == 0 and f > 128 and (f - 1) % 128 == 0


@functools.lru_cache(maxsize=8)
def _gl_constants(cfg: AudioConfig):
    """Per-hop-block bf16 bases: analysis ca_k/sa_k [hop, fp] stacked on a
    leading r axis, synthesis cs_k/ss_k [fp, hop] likewise. In packed mode
    (see _gl_packed) column/row 0 of the sin bases carries the Nyquist
    bin's cos basis and fp == F-1."""
    ca, sa, cs, ss = dsp_audio._fused_bases(cfg)  # [win,F], [F,win]
    win, f = ca.shape
    hop = cfg.hop_length
    r = win // hop
    if _gl_packed(cfg):
        # Preconditions survive `python -O` (a window/DFT convention change
        # that violates them would otherwise silently fold a non-zero basis
        # column and corrupt audio).
        if not (
            np.allclose(sa[:, 0], 0, atol=1e-6)
            and np.allclose(sa[:, f - 1], 0, atol=1e-6)
            and np.allclose(ss[0], 0, atol=1e-6)
            and np.allclose(ss[f - 1], 0, atol=1e-6)
        ):
            raise ValueError(
                "Nyquist packing precondition violated: DC/Nyquist sin bases "
                "are not ~0 for this AudioConfig; refusing to pack."
            )
        sa = np.concatenate([ca[:, f - 1 : f], sa[:, 1 : f - 1]], axis=1)
        ss = np.concatenate([cs[f - 1 : f], ss[1 : f - 1]], axis=0)
        ca, cs = ca[:, : f - 1], cs[: f - 1]
        f -= 1
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


@functools.lru_cache(maxsize=8)
def _wss_inv_compact(cfg: AudioConfig):
    """1/wss in its exact compact form: (head [r-1, hop], mid [1, hop],
    tail [r-1, hop]). The window-square OLA sum is hop-periodic for all
    interior rows; only the first/last r-1 rows differ (verified
    numerically against _fused_wss for several t)."""
    r = cfg.win_length // cfg.hop_length
    t0 = max(4 * r, 16)
    wss = dsp_audio._fused_wss(cfg, t0).reshape(t0 - 1 + r, cfg.hop_length)
    inv = (1.0 / wss).astype(np.float32)
    return inv[: r - 1], inv[r - 1 : r], inv[t0:]


def _nyq_col(m, fp):
    """[ts, fp] array whose column 0 is mag column F-1 (the Nyquist
    magnitude rides in the first lane past the packed width — an aligned
    128-lane slice); all other columns are don't-care."""
    return jnp.pad(m[:, fp : fp + 128], ((0, 0), (0, fp - 128)))


def _proj_pair(m, re, im, packed):
    """Magnitude projection -> (sre, sim) bf16 synthesis operands. In the
    packed real-FFT layout column 0 of (re, im) carries two INDEPENDENT
    real bins — DC in re, Nyquist in im — so each projects against its own
    magnitude (mag columns 0 and F-1) with its own norm; every other
    column is an ordinary complex bin with the shared Euclidean norm."""
    bf = jnp.bfloat16
    if not packed:
        norm = jnp.maximum(jnp.sqrt(re * re + im * im), 1e-8)
        return (m * re / norm).astype(bf), (m * im / norm).astype(bf)
    fp = re.shape[-1]
    mre = m[:, :fp]
    n2 = re * re + im * im
    col0 = jax.lax.broadcasted_iota(jnp.int32, re.shape, 1) == 0
    nre = jnp.maximum(jnp.sqrt(jnp.where(col0, re * re, n2)), 1e-8)
    nim = jnp.maximum(jnp.sqrt(jnp.where(col0, im * im, n2)), 1e-8)
    mim = jnp.where(col0, _nyq_col(m, fp), mre)
    return (mre * re / nre).astype(bf), (mim * im / nim).astype(bf)


def _init_pair(m, fp, packed):
    """Zero-phase init operands: spec = mag + 0i. Packed: the Nyquist
    magnitude enters through the imaginary channel's column 0 (its
    synthesis row lives in ss), so the init sweep pays the im matmul."""
    bf = jnp.bfloat16
    if not packed:
        return m.astype(bf), None
    col0 = jax.lax.broadcasted_iota(jnp.int32, (m.shape[0], fp), 1) == 0
    sim = jnp.where(col0, _nyq_col(m, fp), 0.0)
    return m[:, :fp].astype(bf), sim.astype(bf)


def _gl_body(mag_ref, ca_ref, sa_ref, cs_ref, ss_ref, wih_ref, wim_ref, wit_ref,
             out_ref, v_ref, u_ref, acc_ref, magbuf_ref, sem_ref,
             *, n_iters, r, hop, t, tiles, alpha, packed):
    bf = jnp.bfloat16
    fp = ca_ref.shape[2]
    streaming = magbuf_ref is not None

    def synth_tile(j0, ts, sre16, sim16):
        """Synthesis of one frame tile + roll-aligned local overlap-add,
        accumulated into acc_ref rows [j0, j0+ts+r-1). sim16=None skips the
        imaginary contribution (zero-phase init)."""
        accj = jnp.zeros((ts + r - 1, hop), jnp.float32)
        for k in range(r):
            chunk = jnp.dot(sre16, cs_ref[k], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
            if sim16 is not None:
                chunk += jnp.dot(sim16, ss_ref[k], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
            cp = jnp.pad(chunk, ((0, r - 1), (0, 0)))  # uniform pad: same layout all k
            accj += pltpu.roll(cp, k, 0) if k else cp  # wrapped rows are the zero pad
        acc_ref[j0 : j0 + ts + r - 1, :] += accj

    def analyze_tile(x16, j0, ts):
        """STFT of frames [j0, j0+ts) from the bf16 row-view signal."""
        re = jnp.zeros((ts, ca_ref.shape[2]), jnp.float32)
        im = jnp.zeros_like(re)
        for k in range(r):
            seg = jax.lax.slice(x16, (j0 + k, 0), (j0 + k + ts, hop))
            re += jnp.dot(seg, ca_ref[k], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
            im += jnp.dot(seg, sa_ref[k], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        return re, im

    def foreach_mag_tile(process):
        """process(j0, ts, mag_tile) over all frame tiles; streams tiles
        from HBM with double-buffered DMA when magnitudes don't fit VMEM."""
        if not streaming:
            for j0, ts in tiles:
                process(j0, ts, mag_ref[j0 : j0 + ts, :])
            return
        copies = [
            pltpu.make_async_copy(
                mag_ref.at[pl.ds(j0, ts), :],
                magbuf_ref.at[i % 2, pl.ds(0, ts), :],
                sem_ref.at[i % 2],
            )
            for i, (j0, ts) in enumerate(tiles)
        ]
        copies[0].start()
        for i, (j0, ts) in enumerate(tiles):
            if i + 1 < len(copies):
                copies[i + 1].start()
            copies[i].wait()
            process(j0, ts, magbuf_ref[i % 2, :ts, :])

    def normalized(src_ref):
        """acc * 1/wss using the compact envelope: head rows, one repeated
        interior row (hop-periodic region), tail rows."""
        return jnp.concatenate(
            [
                src_ref[: r - 1, :] * wih_ref[:],
                src_ref[r - 1 : t, :] * wim_ref[:],
                src_ref[t:, :] * wit_ref[:],
            ],
            axis=0,
        )

    def sweep(x):
        """One analysis -> project -> synthesis pass over all frame tiles;
        leaves the un-normalized OLA in acc_ref."""
        acc_ref[:] = jnp.zeros_like(acc_ref)
        x16 = x.astype(bf)

        def project_tile(j0, ts, m):
            re, im = analyze_tile(x16, j0, ts)
            synth_tile(j0, ts, *_proj_pair(m, re, im, packed))

        foreach_mag_tile(project_tile)

    # v_1 = u_0 = istft(mag, zero phase)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    foreach_mag_tile(lambda j0, ts, m: synth_tile(j0, ts, *_init_pair(m, fp, packed)))
    v_ref[:] = normalized(acc_ref)
    u_ref[:] = v_ref[:]

    def body(_, carry):
        sweep(v_ref[:])
        u_i = normalized(acc_ref)
        v_ref[:] = u_i + alpha * (u_i - u_ref[:])
        u_ref[:] = u_i
        return carry

    jax.lax.fori_loop(0, n_iters, body, 0)

    # final projection + in-kernel synthesis: out = istft(P(v_{N+1}))
    sweep(v_ref[:])
    out_ref[:] = normalized(acc_ref)


@functools.lru_cache(maxsize=8)
def _gl_v4_constants(cfg: AudioConfig):
    """v4 bases/envelopes padded to a 128-aligned lane width: the HBM
    signal carries are [rows, hop_pad] (Mosaic requires the lane dim of
    dynamically row-sliced refs be tile-aligned; hop=200 is not), so the
    analysis bases gain zero ROWS [hop..hop_pad) and the synthesis bases
    zero COLS — the padded columns stay exactly zero through every sweep."""
    ca_k, sa_k, cs_k, ss_k = _gl_constants(cfg)
    hop = cfg.hop_length
    hp = _round_up(hop, 128)
    wih, wim, wit = _wss_inv_compact(cfg)
    if hp != hop:
        d = hp - hop
        ca_k = np.pad(np.asarray(ca_k), ((0, 0), (0, d), (0, 0)))
        sa_k = np.pad(np.asarray(sa_k), ((0, 0), (0, d), (0, 0)))
        cs_k = np.pad(np.asarray(cs_k), ((0, 0), (0, 0), (0, d)))
        ss_k = np.pad(np.asarray(ss_k), ((0, 0), (0, 0), (0, d)))
        wih, wim, wit = (np.pad(w, ((0, 0), (0, d))) for w in (wih, wim, wit))
    return hp, ca_k, sa_k, cs_k, ss_k, wih, wim, wit


def _gl_v4_body(mag_ref, ca_ref, sa_ref, cs_ref, ss_ref, wih_ref, wim_ref, wit_ref,
                out_ref, v_ref, u_ref,
                magbuf, vbuf, uprev, w1buf, w2buf, sem_ref,
                *, n_iters, r, t, t_pad, tb, alpha, packed):
    """GL v4 — unbounded-length streaming: v/u signal carries live in HBM
    (kernel OUTPUTS in ANY space) and every sweep runs a dynamic fori_loop
    over frame tiles, DMAing per tile: v rows [j0, j0+tb+r-1) in for
    analysis, mag [j0, j0+tb) in for projection, u_prev [j0, j0+tb) in for
    momentum, u/v (or the final signal) rows [j0, j0+tb) out. Because
    tiles run in ascending order, rows [j0, j0+tb) of the OLA accumulate
    completely once tile j0 finishes (later tiles only touch rows >= j0+tb),
    so each tile finalizes — envelope-normalizes, extrapolates, writes back
    — its own rows and hands the r-1 overlap rows to the next tile as the
    fori_loop carry. VMEM is O(tile) regardless of utterance length; one
    tile body compiles once (no per-tile unroll)."""
    bf = jnp.bfloat16
    fp = ca_ref.shape[2]
    hp = wim_ref.shape[1]  # 128-aligned lane width (hop zero-padded)
    ep = _round_up(max(r - 1, 1), 8)  # 8-aligned sublane count for the
    # overlap carry: Mosaic requires dim-0 ref slices be multiples of the
    # f32 sublane tile (8); rows [r-1, ep) of the carry are always zero
    n_tiles = t_pad // tb

    def env_tile(j0, n):
        """[n, hp] rows j0..j0+n of 1/wss from the compact envelope:
        interior row everywhere, head/tail rows selected by row index
        (dynamic j0 -> per-row where instead of static slicing)."""
        rows = j0 + jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        inv = jnp.broadcast_to(wim_ref[:], (n, hp))
        for k in range(r - 1):
            inv = jnp.where(rows == k, wih_ref[k], inv)
            inv = jnp.where(rows == t + k, wit_ref[k], inv)
        return inv

    def synth(sre, sim):
        accj = jnp.zeros((tb + r - 1, hp), jnp.float32)
        for k in range(r):
            chunk = jnp.dot(sre, cs_ref[k], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
            if sim is not None:
                chunk += jnp.dot(sim, ss_ref[k], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
            cp = jnp.pad(chunk, ((0, r - 1), (0, 0)))
            accj += pltpu.roll(cp, k, 0) if k else cp
        return accj

    def emit_init(j0, n, final):
        """u_0 = v_1 = normalized zero-phase synthesis."""
        w1buf[pl.ds(0, n), :] = final
        w2buf[pl.ds(0, n), :] = final
        c1 = pltpu.make_async_copy(w1buf.at[pl.ds(0, n), :], u_ref.at[pl.ds(j0, n), :], sem_ref.at[3])
        c2 = pltpu.make_async_copy(w2buf.at[pl.ds(0, n), :], v_ref.at[pl.ds(j0, n), :], sem_ref.at[4])
        c1.start(); c2.start(); c1.wait(); c2.wait()

    def emit_iter(j0, n, final):
        """u_i = normalized; v_{i+1} = u_i + alpha (u_i - u_{i-1})."""
        cu = pltpu.make_async_copy(u_ref.at[pl.ds(j0, n), :], uprev.at[pl.ds(0, n), :], sem_ref.at[2])
        cu.start(); cu.wait()
        w1buf[pl.ds(0, n), :] = final
        w2buf[pl.ds(0, n), :] = final + alpha * (final - uprev[pl.ds(0, n), :])
        c1 = pltpu.make_async_copy(w1buf.at[pl.ds(0, n), :], u_ref.at[pl.ds(j0, n), :], sem_ref.at[3])
        c2 = pltpu.make_async_copy(w2buf.at[pl.ds(0, n), :], v_ref.at[pl.ds(j0, n), :], sem_ref.at[4])
        c1.start(); c2.start(); c1.wait(); c2.wait()

    def emit_final(j0, n, final):
        w1buf[pl.ds(0, n), :] = final
        c1 = pltpu.make_async_copy(w1buf.at[pl.ds(0, n), :], out_ref.at[pl.ds(j0, n), :], sem_ref.at[3])
        c1.start(); c1.wait()

    def sweep(analyze, emit):
        def tile(jt, carry):
            j0 = pl.multiple_of(jt * tb, tb)
            cm = pltpu.make_async_copy(mag_ref.at[pl.ds(j0, tb), :], magbuf, sem_ref.at[0])
            cm.start()
            if analyze:
                cv = pltpu.make_async_copy(v_ref.at[pl.ds(j0, tb + ep), :], vbuf, sem_ref.at[1])
                cv.start()
            cm.wait()
            m = magbuf[:, :]
            if analyze:
                cv.wait()
                x16 = vbuf[:].astype(bf)
                re = jnp.zeros((tb, fp), jnp.float32)
                im = jnp.zeros_like(re)
                for k in range(r):
                    seg = jax.lax.slice(x16, (k, 0), (k + tb, hp))
                    re += jnp.dot(seg, ca_ref[k], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
                    im += jnp.dot(seg, sa_ref[k], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
                sre, sim = _proj_pair(m, re, im, packed)
            else:
                sre, sim = _init_pair(m, fp, packed)
            accj = synth(sre, sim)  # [tb + r - 1, hp]
            accj = jnp.pad(accj, ((0, ep - (r - 1)), (0, 0)))  # -> [tb + ep, hp]
            # fold the previous tile's overlap rows in (scatter-free and
            # 8-aligned: Mosaic has no scatter-add, and dim-0 slices must
            # be sublane-tile multiples)
            accj = jnp.concatenate([accj[:ep] + carry, accj[ep:]], axis=0)
            emit(j0, tb, accj[:tb] * env_tile(j0, tb))
            return accj[tb:]

        carry = jax.lax.fori_loop(0, n_tiles, tile, jnp.zeros((ep, hp), jnp.float32))
        # epilogue rows [t_pad, t_pad+ep): the real OLA tail when t_pad == t
        # (+ always-zero alignment rows), harmless junk otherwise (padded
        # frames have mag 0; the host wrapper never reads past row t+r-2)
        emit(t_pad, ep, carry * env_tile(t_pad, ep))

    sweep(False, emit_init)

    def body(_, c):
        sweep(True, emit_iter)
        return c

    jax.lax.fori_loop(0, n_iters, body, 0)
    sweep(True, emit_final)


def _kernel_vmem(mag_ref, ca, sa, cs, ss, wih, wim, wit, out_ref, v, u, acc, **kw):
    _gl_body(mag_ref, ca, sa, cs, ss, wih, wim, wit, out_ref, v, u, acc,
             None, None, **kw)


def _kernel_stream(mag_ref, ca, sa, cs, ss, wih, wim, wit, out_ref, v, u, acc,
                   magbuf, sem, **kw):
    _gl_body(mag_ref, ca, sa, cs, ss, wih, wim, wit, out_ref, v, u, acc,
             magbuf, sem, **kw)


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
    packed = _gl_packed(cfg)
    # packed: mag keeps all F columns, zero-padded to fp+128 lanes so the
    # Nyquist magnitude (column F-1 == fp) starts an aligned 128-lane slice
    fm = fp + 128 if packed else fp
    if f < fm:
        mag = jnp.pad(mag, ((0, 0), (0, fm - f)))
    wih, wim, wit = (jnp.asarray(w) for w in _wss_inv_compact(cfg))

    if t > MAX_FRAMES:  # v4: HBM signal carries, dynamic tile loop
        tb = V4_TILE
        t_pad = _round_up(t, tb)
        if mag.shape[0] < t_pad:
            mag = jnp.pad(mag, ((0, t_pad - mag.shape[0]), (0, 0)))
        ep = _round_up(max(r - 1, 1), 8)  # sublane-aligned carry rows
        rows_pad = t_pad + ep
        hp, ca4, sa4, cs4, ss4, wih4, wim4, wit4 = _gl_v4_constants(cfg)
        kernel = functools.partial(
            _gl_v4_body,
            n_iters=n_iters, r=r, t=t, t_pad=t_pad, tb=tb,
            alpha=cfg.gl_momentum, packed=packed,
        )
        sds = jax.ShapeDtypeStruct((rows_pad, hp), jnp.float32)
        out, _v, _u = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 3,
            out_shape=(sds, sds, sds),  # out + the v/u HBM carries
            scratch_shapes=[
                pltpu.VMEM((tb, fm), jnp.float32),          # mag tile
                pltpu.VMEM((tb + ep, hp), jnp.float32),     # v rows in
                pltpu.VMEM((tb, hp), jnp.float32),          # u_prev in
                pltpu.VMEM((tb, hp), jnp.float32),          # u/out staging
                pltpu.VMEM((tb, hp), jnp.float32),          # v staging
                pltpu.SemaphoreType.DMA((5,)),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(
            mag,
            jnp.asarray(ca4), jnp.asarray(sa4), jnp.asarray(cs4), jnp.asarray(ss4),
            jnp.asarray(wih4), jnp.asarray(wim4), jnp.asarray(wit4),
        )
        lead = cfg.n_fft // 2 - (cfg.n_fft - cfg.win_length) // 2
        return out[:, :hop].reshape(-1)[lead : lead + (t - 1) * hop]

    streaming = t > STREAM_THRESHOLD
    # frame tiles bound the transient spectral buffers to [tb, fp]
    # (on-chip A/B at t=1024, batch 8: tb=512 6.4 ms/utt vs tb=256 7.0;
    # the streaming path narrows to 256 to fit the DMA buffers)
    tb = min(t, 256 if streaming else 512)
    tiles = tuple((j0, min(tb, t - j0)) for j0 in range(0, t, tb))
    rows = t - 1 + r

    kernel_kw = dict(n_iters=n_iters, r=r, hop=hop, t=t, tiles=tiles,
                     alpha=cfg.gl_momentum, packed=packed)
    scratch = [
        pltpu.VMEM((rows, hop), jnp.float32),  # v: istft(c_i)
        pltpu.VMEM((rows, hop), jnp.float32),  # u: istft(n_{i-1})
        pltpu.VMEM((rows, hop), jnp.float32),  # acc: OLA accumulator
    ]
    if streaming:
        kernel = functools.partial(_kernel_stream, **kernel_kw)
        mag_spec = pl.BlockSpec(memory_space=pl.ANY)  # stays in HBM
        scratch += [
            pltpu.VMEM((2, tb, fm), jnp.float32),  # double-buffered mag tiles
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(_kernel_vmem, **kernel_kw)
        mag_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        in_specs=[mag_spec] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, hop), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mag, ca_k, sa_k, cs_k, ss_k, wih, wim, wit)

    # librosa istft span: drop the centering lead, cut to (t-1)*hop samples
    lead = cfg.n_fft // 2 - (cfg.n_fft - cfg.win_length) // 2
    return out.reshape(-1)[lead : lead + (t - 1) * hop]
