"""L5 — converter / discrete-unit dumper (ref convert.py:~1-200 + test paths
in solver.py; SURVEY.md §3.4/3.5).

The conversion stack — encode -> MBV-binarize -> decode(target speaker) ->
denormalize -> Griffin-Lim -> wav — is ONE jitted XLA program per padded
length bucket (the BASELINE.json north-star "one XLA program"), vmapped
over a fixed batch of utterances. Units are the deterministic hard MBV
bits, written one frame per line as space-separated 0/1 ints (the
challenge bitrate artifact); wavs are 16 kHz PCM16 in the submission
layout ``<result>/<target_speaker>/<utt>.wav``.

In the reference this stack is CPU-Griffin-Lim-dominated (SURVEY.md §3.4);
here the whole thing runs on-device and batches across the mesh.
"""

from __future__ import annotations

import functools
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from zerospeech_tts_tpu.config import AudioConfig, Hps
from zerospeech_tts_tpu.dsp import audio as dsp_audio
from zerospeech_tts_tpu.dsp.mulaw import (
    mulaw_compress_device,
    mulaw_compress_host,
    mulaw_expand_device,
    mulaw_expand_host,
)
from zerospeech_tts_tpu.dsp.wavio import load_wav, save_wav, trim_silence
from zerospeech_tts_tpu.models import Decoder, Encoder, discretize, unit_bits


def units_text(units: np.ndarray) -> str:
    """Challenge text format: one latent frame per line, bits space-separated
    (the single source of the format — file dumps and the HTTP service both
    render through this). For 0/1 MBV bits the render is one vectorized
    byte-interleave instead of T*D Python str() calls — corpus dumps write
    thousands of 1024-bit rows, and the scalar join was ~10 ms/utterance
    of pure host time on the measured file-IO path."""
    u = np.asarray(units)
    if u.size == 0:
        return ""
    if u.ndim == 2 and u.dtype.kind in "iub" and ((u == 0) | (u == 1)).all():
        t, d = u.shape
        buf = np.empty((t, 2 * d), np.uint8)
        buf[:, 0::2] = u.astype(np.uint8) + ord("0")
        buf[:, 1::2] = ord(" ")
        buf[:, -1] = ord("\n")
        return buf.tobytes().decode("ascii")[:-1]
    return "\n".join(" ".join(str(int(v)) for v in row) for row in u)


def write_units(path: str | Path, units: np.ndarray) -> None:
    """Unit text file in the challenge format (see units_text)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        f.write(units_text(units) + "\n" if len(units) else "")


def read_units(path: str | Path) -> np.ndarray:
    # np.loadtxt's C tokenizer (numpy >= 1.23) beats any Python-side split
    return np.loadtxt(path, dtype=np.int32, ndmin=2)


def _round_rows(k: int, cap: int) -> int:
    """Smallest ALLOWED batch-row shape >= k, capped: shapes are powers of
    two plus their 1.5x points (1,2,3,4,6,8,12,16,24,32,48,...). Dummy
    rows run the full program (the vocoder does not mask), so pure-pow2
    rounding wasted up to ~1x the tail (9 utts -> 16 rows); the 3*2^i
    shapes bound the round-up at 1/3 (9 -> 12) while a given corpus still
    compiles exactly one tail shape per (bucket, chunk count) — the shape
    is just less wasteful. Batch rows are the outermost dim everywhere
    (conv/dense sublane tiles, GL kernel grid), so non-pow2 row counts
    cost nothing structurally."""
    k = min(int(k), int(cap))
    bs = 1
    while bs < k:
        bs *= 2
    three = 3 * (bs // 4)
    if three >= k:
        bs = three
    return min(bs, int(cap))


def _chunk_rows(k: int, cap: int) -> tuple[int, int]:
    """(executed batch rows, dispatch count) for ``k`` utterances chunked
    under a bucket cap — mirrors Converter._chunk_batch's shape rounding
    (full chunks of ``cap`` rows plus one _round_rows tail chunk).
    Mesh data-axis rounding is not modeled (it is a small further
    round-up that applies identically to every candidate plan)."""
    full, rem = divmod(int(k), int(cap))
    rows = full * cap
    n_disp = full
    if rem:
        rows += _round_rows(rem, cap)
        n_disp += 1
    return rows, n_disp


def plan_buckets(
    frame_lengths,
    max_buckets: int,
    quantum: int,
    min_pad: int = 4,
    target_overhead: float | None = None,
    cap_fn=None,
    dispatch_cost: float = 0.0,
) -> list[int]:
    """Pick <= max_buckets bucket edges (multiples of ``quantum``) that
    minimize total padded frames for the given utterance length multiset.

    ``min_pad``: plan with the padding-invariance constraint (an utterance
    may sit at its bucket edge exactly, or must have >= min_pad pad frames
    — see Converter._MIN_PAD), so the executed plan never falls back to an
    out-of-plan uniform bucket and the program count stays as fitted.

    ``target_overhead``: when given, return the SMALLEST number of edges
    whose planned padding overhead (padded/true - 1) is <= target —
    compiles are the cost of an edge, so don't spend more programs than
    the padding target needs. Falls back to the best achievable plan
    within ``max_buckets`` if no k meets the target (e.g. the quantum
    floor: every distinct quantized length its own edge).

    ``cap_fn`` (bucket frames -> batch-row cap) switches the objective
    from padded frames to EXECUTED rows*frames: dummy batch rows run the
    full program (the vocoder does not mask), so a plan that minimizes
    frame padding can still lose to pow2 tail-chunk rounding when it
    splits the corpus across many thin buckets — the recorded mixed bench
    hit 7.7% frame padding but 24% executed overhead that way (see
    docs/performance.md). With ``cap_fn`` the DP charges each candidate
    bucket its true chunked cost (full cap-row chunks + one rounded tail,
    Converter._chunk_batch semantics) plus ``dispatch_cost`` (in
    frame-row units) per dispatch — set dispatch_cost high on
    wire/tunnel-bound hosts where each dispatch costs ~fixed wall time,
    0 on locally-attached devices. More edges can then genuinely HURT;
    the DP searches every k and keeps the cheapest.

    Uniform quantization (``ceil(t/bucket_frames)*bucket_frames``) wastes
    frames wherever the corpus length histogram is uneven — the recorded
    mixed-length bench loses 31% of frames to padding that way (see
    docs/performance.md). Placing the SAME NUMBER of edges adaptively keeps
    the program/compile count unchanged while cutting the padding, so the
    win survives on real (non-wire-bound) hardware too.

    Exact DP (1-D clustering): utterances are grouped by quantized length;
    dp[j][k] = min waste covering groups 1..j with k edges, edge k at group
    j's value. O(m^2 * max_buckets) for m distinct quantized lengths.
    (Exactness holds in executed mode too: every utterance goes to the
    smallest covering edge, so segment cost depends only on the segment.)
    """
    if int(max_buckets) < 1:
        raise ValueError(f"adaptive bucket count must be >= 1, got {max_buckets}")
    ts = np.asarray(frame_lengths, np.int64)
    if ts.size == 0:
        return []
    q = int(quantum)
    quant = -(-ts // q) * q  # ceil to quantum
    while True:  # bump 1..min_pad-1 pads up a quantum (loops only if q < min_pad)
        short = (quant > ts) & (quant - ts < int(min_pad))
        if not short.any():
            break
        quant = np.where(short, quant + q, quant)
    vals, inv = np.unique(quant, return_inverse=True)
    m = len(vals)
    cnt = np.bincount(inv, minlength=m).astype(np.int64)
    tsum = np.bincount(inv, weights=ts.astype(np.float64), minlength=m)
    ccum = np.concatenate([[0], np.cumsum(cnt)])
    scum = np.concatenate([[0.0], np.cumsum(tsum)])
    k_max = min(int(max_buckets), m)
    INF = float("inf")
    dp = np.full((m + 1, k_max + 1), INF)
    prev = np.zeros((m + 1, k_max + 1), np.int64)
    dp[0, 0] = 0.0
    caps = None
    if cap_fn is not None:
        caps = [max(1, int(cap_fn(int(v)))) for v in vals]
    for k in range(1, k_max + 1):
        for j in range(1, m + 1):
            # groups i+1..j all pad to vals[j-1]
            best, arg = INF, 0
            for i in range(k - 1, j):
                if dp[i, k - 1] == INF:
                    continue
                count = ccum[j] - ccum[i]
                if caps is None:
                    seg = vals[j - 1] * count - (scum[j] - scum[i])
                else:
                    rows, n_disp = _chunk_rows(count, caps[j - 1])
                    seg = (rows * vals[j - 1] - (scum[j] - scum[i])
                           + dispatch_cost * n_disp)
                c = dp[i, k - 1] + seg
                if c < best:
                    best, arg = c, i
            dp[j, k] = best
            prev[j, k] = arg
    if target_overhead is not None:
        total_true = float(scum[m])
        k_best = 0
        for k in range(1, k_max + 1):
            if dp[m, k] <= target_overhead * total_true:
                k_best = k
                break
        if not k_best:  # target unreachable within max_buckets: best effort
            k_best = int(np.argmin(dp[m, 1:])) + 1
    else:
        # in frames mode fewer edges can never help; in executed mode they
        # genuinely can (row rounding + dispatch_cost) — argmin over all k
        k_best = int(np.argmin(dp[m, 1:])) + 1
    edges, j = [], m
    for k in range(k_best, 0, -1):
        edges.append(int(vals[j - 1]))
        j = int(prev[j, k])
    return sorted(edges)


class Converter:
    """Checkpointed encoder+decoder -> conversion programs, cached per
    (n_frames, batch) bucket shape."""

    def __init__(
        self,
        hps: Hps,
        acfg: AudioConfig,
        enc_params,
        dec_params,
        gl_iters: int | None = None,
        stft_method: str | None = None,  # None -> fastest valid (fused matmul)
        batch_size: int = 8,
        bucket_frames: int = 64,
        frame_budget: int | None = None,  # rows*frames per dispatch budget.
        # When set, SHORT buckets take more utterances per dispatch (batch
        # cap = largest allowed row shape with cap*bucket <= budget, never below
        # batch_size, <= 128 rows): a 128-frame bucket at the same frame
        # budget as a 1024-frame batch-8 dispatch carries 64 utterances,
        # so mixed-length corpora stop paying per-dispatch overhead per
        # handful of short utterances. Memory/VMEM pressure per dispatch
        # stays ~constant (rows x frames is the working-set scale). None
        # keeps the flat batch_size cap for every bucket.
        stats=None,  # SpeakerStats when hps.speaker_norm (z-norm in/out)
        mesh=None,  # shard the utterance batch over the mesh 'data' axis
        feat: str = "lin",  # which features the AE was trained on (lin|mel)
        compute_dtype: str = "float32",  # bfloat16 doubles MXU rate on real v5e
        encoder_dtype: str | None = None,  # None -> compute_dtype. "float32"
        # + pcm_wire="int16" is the UNIT-EXACT deployment config: the
        # encoder (whose discrete units are the challenge's primary
        # artifact) runs in f32 while the decoder+Griffin-Lim (audio
        # quality, far above the GL noise floor) keep the bf16 MXU rate.
        # Encoder cost is small next to GL-100, so this costs little.
        wire: str = "bf16",  # host->device feature encoding: bf16 | uint8
        # uint8 quantizes each utterance's features to 256 levels over its
        # own [min, max] (dequantized on-device) — halves the input bytes
        # again; conversion on tunneled/remote hosts is wire-bound, not
        # FLOP-bound. Unit agreement vs the f32 path is ~0.997 (see
        # tests/test_parallel.py::test_uint8_wire_converter).
        gru_impl: str | None = None,  # GRU recurrence backend. None -> auto:
        # on TPU the decoder (and, in bf16 fast configs, the encoder) uses
        # the ops/pallas_gru whole-recurrence kernel; the challenge-exact
        # f32 ENCODER always keeps the lax.scan path (the kernel is not
        # bit-identical — f32 state + different matmul staging), so dumped
        # units are unchanged by this switch in the exact config. "scan" /
        # "pallas" force one backend for both modules (A/B debugging);
        # env ZSTTS_NO_PALLAS_GRU=1 disables auto selection.
        pcm_wire: str = "int16",  # PCM transport: int16 (bit-exact) | mulaw
        # mulaw = 8-bit G.711-style companding on BOTH PCM directions (wav
        # up-wire of the PCM-in programs, synthesized audio down-wire of
        # every program): halves the dominant wire bytes at ~38 dB SNR,
        # far above the Griffin-Lim noise floor. Files on disk stay PCM16
        # either way. See dsp/mulaw.py and docs/performance.md.
    ):
        assert bucket_frames % hps.downsample == 0
        assert feat in ("lin", "mel")
        assert wire in ("bf16", "uint8")
        assert pcm_wire in ("int16", "mulaw")
        self.wire = wire
        self.pcm_wire = pcm_wire
        self.feat = feat
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.encoder_dtype = jnp.dtype(encoder_dtype) if encoder_dtype else self.compute_dtype
        self.hps = hps
        self.acfg = acfg
        self.mesh = mesh
        self._x_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            if batch_size % n_data:
                batch_size = -(-batch_size // n_data) * n_data  # round up
            self._x_sharding = NamedSharding(mesh, P(None))  # params replicated
            self._batch_sharding = NamedSharding(mesh, P("data"))
            enc_params = jax.device_put(enc_params, self._x_sharding)
            dec_params = jax.device_put(dec_params, self._x_sharding)
        self.enc_params = enc_params
        self.dec_params = dec_params
        self.gl_iters = gl_iters if gl_iters is not None else acfg.gl_iters
        self.stft_method = stft_method
        self.batch_size = batch_size
        self.bucket_frames = bucket_frames
        self.frame_budget = frame_budget
        self.bucket_edges: list[int] | None = None  # set by fit_buckets()
        self.stats = stats
        if gru_impl is None:
            import os

            use_pallas = (
                jax.default_backend() == "tpu"
                and not os.environ.get("ZSTTS_NO_PALLAS_GRU")
            )
            dec_gru = "pallas" if use_pallas else "scan"
            enc_gru = (
                "pallas"
                if use_pallas and self.encoder_dtype != jnp.float32
                else "scan"
            )
        else:
            assert gru_impl in ("scan", "pallas"), gru_impl
            dec_gru = enc_gru = gru_impl
        self.encoder = Encoder(hps, gru_impl=enc_gru)
        self.decoder = Decoder(hps, gru_impl=dec_gru)
        self._progs: dict = {}
        self._enc_progs: dict = {}
        self._wav_progs: dict = {}

    # ------------------------------------------------------------- buckets

    # Minimum nonzero bucket padding, in input frames. The encoder's widest
    # conv (bank kernel 8) reads 4 rows past the true boundary; with >= 4
    # pad rows those reads land in the mirror-filled region (exact
    # reflect values) rather than the static bucket-edge reflection, which
    # is what makes padded encoding bit-identical to exact-length encoding
    # (see models/encoder.py). pad == 0 is also exact (the static edge IS
    # the true boundary).
    _MIN_PAD = 4

    def _bucket_of(self, t: int) -> int:
        """Bucket (padded frame count) for a true frame count ``t``:
        smallest fitted edge >= t when fit_buckets() ran, else uniform
        ceil-to-bucket_frames quantization. Buckets leaving 1..3 pad frames
        are bumped up so padding is always 0 or >= _MIN_PAD (exactness
        precondition of the length-masked encoder)."""
        if self.bucket_edges:
            edges = self.bucket_edges
            j = int(np.searchsorted(np.asarray(edges), t))
            while j < len(edges):
                if edges[j] == t or edges[j] - t >= self._MIN_PAD:
                    return edges[j]
                j += 1
            # longer than anything fitted (out-of-plan utterance): fall back
            # to uniform quantization so the program still exists
        tb = -(-t // self.bucket_frames) * self.bucket_frames
        if 0 < tb - t < self._MIN_PAD:
            tb += self.bucket_frames
        return tb

    def fit_buckets(
        self, frame_lengths, max_buckets: int, target_overhead: float | None = None,
        cost_model: str = "frames", dispatch_cost_frames: float = 0.0,
    ) -> list[int]:
        """Fit adaptive bucket edges to an observed utterance length
        distribution (frame counts BEFORE padding). Keeps at most
        ``max_buckets`` distinct program shapes — same compile/dispatch
        count as uniform bucketing with that many occupied buckets, less
        padding. Edges stay multiples of ``bucket_frames`` so shapes remain
        grid-aligned (downsample divides them) and reusable across corpora.
        ``target_overhead`` picks the smallest edge count meeting a padding
        budget instead of spending all ``max_buckets`` (see plan_buckets).

        ``cost_model="executed"`` plans against the TRUE dispatch cost —
        executed rows*frames under this Converter's chunking (tail-shape
        rounding, per-bucket frame-budget caps) plus
        ``dispatch_cost_frames`` per dispatch — instead of frame padding
        alone; see plan_buckets. Use it when the goal is wall time /
        device FLOPs rather than a padding figure."""
        if cost_model not in ("frames", "executed"):
            raise ValueError(f"cost_model must be frames|executed, got {cost_model!r}")
        self.bucket_edges = plan_buckets(
            frame_lengths, max_buckets, self.bucket_frames,
            min_pad=self._MIN_PAD, target_overhead=target_overhead,
            cap_fn=self._bucket_cap if cost_model == "executed" else None,
            dispatch_cost=dispatch_cost_frames,
        )
        return self.bucket_edges

    # ------------------------------------------------------------ programs

    def _gl_method(self, n_frames: int):
        """Vocoder backend for a bucket: the whole-loop Pallas GL kernel
        where it can sit under the per-utterance vmap; for longer buckets
        (HBM-streamed magnitudes, un-vmappable ANY-space input) the same
        kernel runs per utterance under lax.map ("pallas_seq" — scan never
        batches the kernel, and GL per utterance still beats the batched
        XLA path); else the fused matmul XLA path (stft_method overrides)."""
        gl_method = self.stft_method
        if gl_method is None and jax.default_backend() == "tpu":
            from zerospeech_tts_tpu.ops.pallas_gl import (
                pallas_gl_supported,
                pallas_gl_vmap_supported,
            )

            if pallas_gl_vmap_supported(self.acfg, n_frames):
                gl_method = "pallas"  # whole-GL-in-VMEM kernel (1.5x XLA path)
            elif pallas_gl_supported(self.acfg, n_frames):
                # per-utterance kernel under lax.map; with a mesh the map
                # runs INSIDE shard_map over the local batch slice (a bare
                # scan over a mesh-sharded axis would gather), so long
                # sharded buckets keep the kernel too
                gl_method = "pallas_seq"
        return gl_method

    def _convert_core(
        self, enc_params, dec_params, x, spk, tgt_mean, tgt_std, gl_method, tlens=None
    ):
        """Shared traced tail of every conversion program: normalized f32
        features [B, T, F] -> (bit-packed units, per-target PCM16).

        ``tlens`` ([B] int32 true frame counts) drives the length-masked
        encoder/decoder so bucket padding never changes the true frames'
        units or audio (the reference converts batch-1 at exact length)."""
        acfg = self.acfg
        cd, ed = self.compute_dtype, self.encoder_dtype
        if ed != jnp.float32:
            enc_params = jax.tree.map(
                lambda p: p.astype(ed) if p.dtype == jnp.float32 else p, enc_params
            )
        if cd != jnp.float32:
            dec_params = jax.tree.map(
                lambda p: p.astype(cd) if p.dtype == jnp.float32 else p, dec_params
            )
        zlens = None if tlens is None else (tlens + self.hps.downsample - 1) // self.hps.downsample
        # NOTE on unit bit-exactness across configs: a mixed program
        # (encoder_dtype=f32, compute_dtype=bf16) does NOT reproduce the
        # all-f32 program's units bit-for-bit — XLA's global layout and
        # scheduling decisions depend on the whole module, so the f32
        # encoder's last-ulp rounding shifts with the DECODER's dtype
        # (measured: ~4e-4 of bits flip at batch 32; an
        # optimization_barrier on the logits does not stop it). For
        # challenge-exact units use compute_dtype=f32: the Pallas GL
        # kernel (~93% of conversion FLOPs) runs bf16 MXU matmuls
        # internally regardless of config, so the all-f32 program costs
        # only ~0.1% device-side vs all-bf16 (see docs/performance.md).
        logits = self.encoder.apply(enc_params, x.astype(ed), lengths=tlens).astype(jnp.float32)
        # mode-aware (ref enc_mode switch): the dumped 0/1 rows AND the
        # decode latent follow hps.enc_mode — for the default "binary"
        # both equal the thresholded MBV bits (bit-identical to before);
        # one_hot decodes from the argmax one-hot row, "continues" decodes
        # from the raw logits while the dump is their binary reading
        units = unit_bits(logits, self.hps.enc_mode)
        z = (
            discretize(logits, self.hps.enc_mode, self.hps.gumbel_temp, None).astype(cd)
            if self.hps.enc_mode == "continues"
            else units.astype(cd)
        )

        vocoder = (
            dsp_audio.spectrogram2wav if self.feat == "lin" else dsp_audio.melspectrogram2wav
        )

        seq = gl_method == "pallas_seq"  # lax.map: the kernel must never be vmapped

        voc = lambda m: vocoder(  # noqa: E731
            m, acfg, n_iters=self.gl_iters, method="pallas" if seq else gl_method
        )

        def _pcm_out(wav):
            if self.pcm_wire == "mulaw":  # 8-bit companded down-wire
                return mulaw_compress_device(jnp.clip(wav, -1.0, 1.0))
            return jnp.clip(wav * 32767.0, -32768.0, 32767.0).astype(jnp.int16)

        def decode_one(spk_row, mean_row, std_row):
            xh = self.decoder.apply(dec_params, z, spk_row, lengths=zlens).astype(jnp.float32)
            xh = jnp.clip(xh * std_row[None, None, :] + mean_row[None, None, :], 0.0, 1.0)
            if seq and self.mesh is not None:
                # sharded long bucket: each device lax.maps the kernel over
                # its LOCAL slice of the utterance batch (batch_size is
                # rounded up to a multiple of the data axis in __init__)
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                wav = shard_map(
                    lambda a: jax.lax.map(voc, a),
                    mesh=self.mesh,
                    in_specs=P("data"),
                    out_specs=P("data"),
                    check_vma=False,
                )(xh)
            else:
                wav = jax.lax.map(voc, xh)
            return _pcm_out(wav)

        if seq:  # targets sequential too: vmap-of-scan would re-batch the kernel
            pcm = jax.lax.map(lambda a: decode_one(*a), (spk, tgt_mean, tgt_std))
        else:
            # Cross-target BATCHED decode (VERDICT r3 ask 1): fold the
            # target axis into the utterance batch so the decoder (convs +
            # the serial frame-rate GRU) runs ONCE at batch B*n_tgt —
            # double the MXU rows per recurrence step and half the scan
            # dispatches vs vmapping decode over targets. Batch-major fold
            # (targets minor) so a mesh-sharded batch axis stays the major
            # axis of the merged dimension (shard-local rows stay
            # contiguous; no resharding under GSPMD).
            n_tgt, bsz = spk.shape
            z_all = jnp.broadcast_to(z[:, None], (bsz, n_tgt) + z.shape[1:]).reshape(
                (bsz * n_tgt,) + z.shape[1:]
            )
            spk_flat = jnp.swapaxes(spk, 0, 1).reshape(-1)
            zlens_all = None if zlens is None else jnp.repeat(zlens, n_tgt)
            xh = self.decoder.apply(
                dec_params, z_all, spk_flat, lengths=zlens_all
            ).astype(jnp.float32)
            mean_all = jnp.broadcast_to(
                tgt_mean[None], (bsz,) + tgt_mean.shape
            ).reshape(bsz * n_tgt, 1, -1)
            std_all = jnp.broadcast_to(
                tgt_std[None], (bsz,) + tgt_std.shape
            ).reshape(bsz * n_tgt, 1, -1)
            xh = jnp.clip(xh * std_all + mean_all, 0.0, 1.0)
            wav = jax.vmap(voc)(xh)  # [B*n_tgt, n_samp]
            pcm_flat = _pcm_out(wav)
            pcm = jnp.swapaxes(
                pcm_flat.reshape(bsz, n_tgt, -1), 0, 1
            )  # [n_tgt, B, n]
        packed = jnp.packbits(units.astype(jnp.uint8), axis=-1)
        return packed, pcm

    def _program(self, n_frames: int):
        """One XLA program: [B, T, F] padded lin features (bf16 on the wire)
        + target speaker -> (bit-packed units [B, T//ds, emb//8] uint8,
        PCM16 wavs [B, (T-1)*hop] int16).

        Outputs are wire-optimized: the MBV bits are packed 8-per-byte and
        the wav is quantized to its final PCM16 form on-device, cutting
        host<->device traffic ~4x (the tunnel, not the FLOPs, bounds
        conversion throughput on this hardware).
        """
        cached = self._progs.get((n_frames, self.wire))
        if cached is not None:
            return cached
        gl_method = self._gl_method(n_frames)

        def run(enc_params, dec_params, x, spk, tgt_mean, tgt_std, wire_lo, wire_scale, tlens):
            # spk: [n_targets, B] — encode once, decode per target (features
            # cross the tunnel once for ALL targets). tgt_mean/std:
            # [n_targets, n_feat] per-speaker denorm (identity when
            # speaker_norm is off). wire_lo/wire_scale: [B] per-utterance
            # uint8 dequantization (unused constants on the bf16 wire).
            # tlens: [B] true frame counts (padding-invariant encoding).
            cd = self.compute_dtype
            if x.dtype == jnp.uint8:
                x = (
                    x.astype(cd) * wire_scale[:, None, None].astype(cd)
                    + wire_lo[:, None, None].astype(cd)
                )
            return self._convert_core(
                enc_params, dec_params, x, spk, tgt_mean, tgt_std, gl_method, tlens
            )

        prog = jax.jit(run)
        self._progs[(n_frames, self.wire)] = prog
        return prog

    def _wav_program(self, n_frames: int):
        """PCM-in fused program (the reference --test stack starts from
        wavs, SURVEY.md §3.4): int16 PCM [B, n_samp] -> on-device frontend
        (preemphasis/STFT/mel/dB-norm, f32) -> per-utterance source z-norm
        -> encode -> units -> decode per target -> Griffin-Lim -> PCM16.

        One dispatch for the WHOLE stack: the features never exist on the
        host and never cross the wire (int16 PCM is ~22% fewer bytes than
        uint8 lin features at the 200-sample hop), and the frontend runs
        in f32 on-device — strictly higher fidelity than any feature wire.
        """
        cached = self._wav_progs.get(n_frames)
        if cached is not None:
            return cached
        acfg = self.acfg
        gl_method = self._gl_method(n_frames)
        # matmul 'fused' frontend: the Pallas frontend kernel cannot sit
        # under the per-utterance vmap of a batched program
        fe_method = dsp_audio.resolve_method(acfg, None)

        def run(enc_params, dec_params, pcm, spk, src_mean, src_std, tgt_mean, tgt_std, slens):
            # slens: [B] true SAMPLE counts — exact tail reflection in the
            # frontend plus padding-invariant encode/decode downstream
            y = self._pcm_wire_expand(pcm)
            mel, mag = jax.vmap(
                lambda w, sl: dsp_audio.wav_to_features(w, acfg, method=fe_method, length=sl)
            )(y, slens)
            x = mag if self.feat == "lin" else mel
            x = (x - src_mean[:, None, :]) / src_std[:, None, :]
            tlens = 1 + slens // acfg.hop_length
            return self._convert_core(
                enc_params, dec_params, x, spk, tgt_mean, tgt_std, gl_method, tlens
            )

        prog = jax.jit(run)
        self._wav_progs[n_frames] = prog
        return prog

    def _pcm_wire_expand(self, pcm: jnp.ndarray) -> jnp.ndarray:
        """Traced up-wire decode: wire PCM -> float wav in [-1, 1]."""
        if self.pcm_wire == "mulaw":
            return mulaw_expand_device(pcm)
        # load_wav convention (y = int16 / 32768): bit-exact wire for PCM16 sources
        return pcm.astype(jnp.float32) * (1.0 / 32768.0)

    def _pcm_wire_batch(self, n_samp: int, batch: int | None = None) -> np.ndarray:
        """Zero-filled host staging buffer for the PCM up-wire (the mu-law
        code for digital silence is 128, not 0)."""
        b = self.batch_size if batch is None else batch
        if self.pcm_wire == "mulaw":
            return np.full((b, n_samp), 128, np.uint8)
        return np.zeros((b, n_samp), np.int16)

    def _pcm_wire_pack(self, wav_f32: np.ndarray) -> np.ndarray:
        """Host up-wire encode: float wav -> wire PCM row."""
        w = np.clip(np.rint(wav_f32 * 32768.0), -32768, 32767).astype(np.int16)
        return mulaw_compress_host(w) if self.pcm_wire == "mulaw" else w

    def _pcm_wire_read(self, row: np.ndarray) -> np.ndarray:
        """Host down-wire decode: wire audio row -> int16 PCM (LUT gather)."""
        return mulaw_expand_host(row) if self.pcm_wire == "mulaw" else row

    def _wire_batch(self, xs: list[np.ndarray]):
        """Stack a padded feature batch for the wire: bf16, or uint8 with
        per-utterance [min, max] dequantization scales."""
        x = np.stack(xs)
        if self.wire == "bf16":
            b = x.shape[0]
            return (
                jnp.asarray(x, dtype=jnp.bfloat16),
                jnp.zeros((b,), jnp.float32),
                jnp.ones((b,), jnp.float32),
            )
        lo = x.min(axis=(1, 2)).astype(np.float32)
        hi = x.max(axis=(1, 2)).astype(np.float32)
        scale = np.maximum(hi - lo, 1e-6) / 255.0
        # in-place passes: quantization is host-side work on the conversion
        # critical path (~45 ms/batch with naive temporaries at flagship size)
        q = x - lo[:, None, None]
        np.multiply(q, (1.0 / scale)[:, None, None], out=q)
        np.rint(q, out=q)
        np.clip(q, 0.0, 255.0, out=q)
        return jnp.asarray(q.astype(np.uint8)), jnp.asarray(lo), jnp.asarray(scale)

    def _encode_program(self, n_frames: int):
        """Units-only program (ref enc_only switch: dump units w/o synthesis)."""
        cached = self._enc_progs.get((n_frames, self.wire))
        if cached is not None:
            return cached

        def run(enc_params, x, wire_lo, wire_scale, tlens):
            if x.dtype == jnp.uint8:
                x = (
                    x.astype(jnp.float32) * wire_scale[:, None, None]
                    + wire_lo[:, None, None]
                )
            units = unit_bits(
                self.encoder.apply(enc_params, x.astype(jnp.float32), lengths=tlens),
                self.hps.enc_mode,
            )
            return jnp.packbits(units.astype(jnp.uint8), axis=-1)

        prog = jax.jit(run)
        self._enc_progs[(n_frames, self.wire)] = prog
        return prog

    def _wav_encode_program(self, n_frames: int):
        """Units-only PCM-in program: int16 wav -> on-device frontend ->
        source z-norm -> encode -> packed MBV bits (ref enc_only from wavs)."""
        cached = self._wav_progs.get(("enc", n_frames))
        if cached is not None:
            return cached
        acfg = self.acfg
        fe_method = dsp_audio.resolve_method(acfg, None)

        def run(enc_params, pcm, src_mean, src_std, slens):
            y = self._pcm_wire_expand(pcm)
            mel, mag = jax.vmap(
                lambda w, sl: dsp_audio.wav_to_features(w, acfg, method=fe_method, length=sl)
            )(y, slens)
            x = mag if self.feat == "lin" else mel
            x = (x - src_mean[:, None, :]) / src_std[:, None, :]
            tlens = 1 + slens // acfg.hop_length
            units = unit_bits(
                self.encoder.apply(enc_params, x, lengths=tlens), self.hps.enc_mode
            )
            return jnp.packbits(units.astype(jnp.uint8), axis=-1)

        prog = jax.jit(run)
        self._wav_progs[("enc", n_frames)] = prog
        return prog

    def encode_units_from_wavs(
        self,
        wavs: list[np.ndarray],
        src_speakers: list[str] | None = None,
        trim: bool = True,
    ) -> list[np.ndarray]:
        """Discrete-unit dump straight from wavs, no synthesis (ref
        enc_only x --test: the bitrate-only submission path from test
        audio). Source normalization follows the convert_wavs_multi
        contract ('__global__' when src_speakers is omitted)."""
        acfg, hps = self.acfg, self.hps
        wavs = [np.asarray(w, np.float32) for w in wavs]
        if trim:
            wavs = [trim_silence(w, acfg.top_db) for w in wavs]
        n = len(wavs)
        if self.stats is not None:
            if src_speakers is None:
                src_speakers = ["__global__"] * n
            s_mean, s_std = self.stats.arrays_for(src_speakers)
        else:
            s_mean = np.zeros((n, hps.n_feat), np.float32)
            s_std = np.ones((n, hps.n_feat), np.float32)

        out: list = [None] * n
        buckets: dict[int, list[int]] = {}
        for i in np.argsort([-len(w) for w in wavs], kind="stable"):
            t = dsp_audio.n_frames_for(len(wavs[int(i)]), acfg)
            buckets.setdefault(self._bucket_of(t), []).append(int(i))
        ds, hop = hps.downsample, acfg.hop_length
        inflight = []
        for tb, idxs in buckets.items():
            prog = self._wav_encode_program(tb)
            n_samp = tb * hop - 1
            cap_b = self._bucket_cap(tb)
            for c0 in range(0, len(idxs), cap_b):
                chunk = idxs[c0 : c0 + cap_b]
                bs_c = self._chunk_batch(len(chunk), cap_b)
                pcm = self._pcm_wire_batch(n_samp, bs_c)
                sm = np.zeros((bs_c, hps.n_feat), np.float32)
                ss = np.ones((bs_c, hps.n_feat), np.float32)
                sl = np.full(bs_c, n_samp, np.int32)  # dummies act full-length
                for j, i in enumerate(chunk):
                    w = self._pcm_wire_pack(wavs[i])
                    pcm[j, : len(w)] = w
                    sm[j], ss[j] = s_mean[i], s_std[i]
                    sl[j] = len(w)
                x, sm_d, ss_d, sl_d = (
                    jnp.asarray(pcm), jnp.asarray(sm), jnp.asarray(ss), jnp.asarray(sl),
                )
                if self.mesh is not None:  # same DP layout as convert_wavs_multi
                    x = jax.device_put(x, self._batch_sharding)
                    sm_d = jax.device_put(sm_d, self._batch_sharding)
                    ss_d = jax.device_put(ss_d, self._batch_sharding)
                    sl_d = jax.device_put(sl_d, self._batch_sharding)
                inflight.append((chunk, prog(self.enc_params, x, sm_d, ss_d, sl_d)))
        for chunk, packed_d in inflight:
            units = np.unpackbits(np.asarray(packed_d), axis=-1)[..., : hps.emb_size]
            for j, i in enumerate(chunk):
                t_true = dsp_audio.n_frames_for(len(wavs[i]), acfg)
                out[i] = units[j][: -(-t_true // ds)].astype(np.int32)
        return out

    def encode_units(self, feats_list: list[np.ndarray], src_speakers=None) -> list[np.ndarray]:
        """Dump discrete units for a feature list without synthesis
        (ref enc_only; the challenge bitrate-only submission path)."""
        n = len(feats_list)
        if self.stats is not None:
            if src_speakers is None:
                raise ValueError(
                    "speaker_norm is on (Converter has stats) but src_speakers "
                    "was not given — units would be computed from features "
                    "normalized with the WRONG (global) statistics. Pass the "
                    "source speaker per utterance, or build the Converter with "
                    "stats=None to opt out."
                )
            feats_list = [self.stats.normalize(f, s) for f, s in zip(feats_list, src_speakers)]
        out: list = [None] * n
        buckets: dict[int, list[int]] = {}
        for i in np.argsort([-(f.shape[0]) for f in feats_list], kind="stable"):
            buckets.setdefault(self._bucket_of(feats_list[i].shape[0]), []).append(int(i))
        ds = self.hps.downsample
        inflight = []
        for tb, idxs in buckets.items():
            prog = self._encode_program(tb)
            for c0 in range(0, len(idxs), self.batch_size):
                chunk = idxs[c0 : c0 + self.batch_size]
                xs = [self._pad_frames(feats_list[i]) for i in chunk]
                tl = np.full(self.batch_size, tb, np.int32)
                tl[: len(chunk)] = [feats_list[i].shape[0] for i in chunk]
                while len(xs) < self.batch_size:
                    xs.append(np.zeros_like(xs[0]))
                x, wlo, wscale = self._wire_batch(xs)
                tl_d = jnp.asarray(tl)
                if self.mesh is not None:  # same DP layout as convert_features_multi
                    x = jax.device_put(x, self._batch_sharding)
                    wlo = jax.device_put(wlo, self._batch_sharding)
                    wscale = jax.device_put(wscale, self._batch_sharding)
                    tl_d = jax.device_put(tl_d, self._batch_sharding)
                inflight.append((chunk, prog(self.enc_params, x, wlo, wscale, tl_d)))
        for chunk, packed_d in inflight:
            units = np.unpackbits(np.asarray(packed_d), axis=-1)[..., : self.hps.emb_size]
            for j, i in enumerate(chunk):
                out[i] = units[j][: -(-feats_list[i].shape[0] // ds)].astype(np.int32)
        return out

    # ------------------------------------------------------------- helpers

    def _bucket_cap(self, tb: int) -> int:
        """Batch cap for a bucket of ``tb`` frames: the flat batch_size,
        or — with a frame_budget — the largest allowed row shape
        (_round_rows set: pow2 and 3*2^i) whose rows*frames stays within
        the budget (never below batch_size, at most 128 rows), so short
        buckets fill each dispatch instead of paying per-dispatch
        overhead per handful of utterances."""
        if not self.frame_budget:
            return self.batch_size
        cap = 1
        for s in (2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128):
            if s * tb <= self.frame_budget:
                cap = s
        return max(cap, self.batch_size)

    def _chunk_batch(self, k: int, cap: int | None = None) -> int:
        """Batch rows for a chunk of ``k`` utterances: smallest allowed
        shape >= k (_round_rows: pow2 plus 3*2^i points, so ~2*log2(cap)
        possible shapes per bucket and tail round-up waste bounded at
        1/3), capped at the bucket's cap and rounded up to a multiple of
        the mesh data axis. Dummy rows run the FULL program (the vocoder
        does not mask), so a 3-utterance tail chunk should not dispatch a
        32-row program — with a handful of adaptive buckets the tail
        chunks are where most dummy FLOPs were."""
        cap = cap or self.batch_size
        bs = _round_rows(k, cap)
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            bs = -(-bs // n_data) * n_data
        return bs

    def _pad_frames(self, feats: np.ndarray) -> np.ndarray:
        t = feats.shape[0]
        tb = self._bucket_of(t)
        if tb > t:
            feats = np.pad(feats, ((0, tb - t), (0, 0)))
        return feats

    def convert_features_multi(
        self,
        feats_list: list[np.ndarray],
        spk_ids: list[int],
        tgt_names: list[str] | None = None,
        src_speakers: list[str] | None = None,
    ):
        """Convert [T_i, n_feat] lin features for SEVERAL target speakers in
        one pass: features cross the wire once, units encode once, the
        decoder+vocoder run per target on-device.

        Returns (units_list, wavs_per_target) where units_list[i] is the
        {0,1} int array for utterance i and wavs_per_target[k][i] the int16
        PCM for target k. Buckets by padded length; each chunk's batch is
        right-sized to an allowed row shape <= batch_size (_chunk_batch), so tail
        chunks don't burn full-batch vocoder FLOPs on dummy rows. All
        programs are LAUNCHED
        first and read back afterwards, so device compute overlaps the
        (slow) host transfers — async dispatch is the pipeline, no host
        threading needed.
        """
        n = len(feats_list)
        if self.stats is not None:
            if src_speakers is None or tgt_names is None:
                raise ValueError(
                    "speaker_norm is on (Converter has stats) but "
                    f"{'src_speakers' if src_speakers is None else 'tgt_names'} "
                    "was not given — conversion would (de)normalize with the "
                    "WRONG (global) statistics. Pass per-utterance source "
                    "speakers and per-target names, or build the Converter "
                    "with stats=None to opt out."
                )
            feats_list = [self.stats.normalize(f, s) for f, s in zip(feats_list, src_speakers)]
            t_mean, t_std = self.stats.arrays_for(tgt_names)
        else:
            t_mean = np.zeros((len(spk_ids), self.hps.n_feat), np.float32)
            t_std = np.ones((len(spk_ids), self.hps.n_feat), np.float32)
        t_mean_d, t_std_d = jnp.asarray(t_mean), jnp.asarray(t_std)
        units_out: list = [None] * n
        wavs_out: list[list] = [[None] * n for _ in spk_ids]

        buckets: dict[int, list[int]] = {}
        order = np.argsort([-(f.shape[0]) for f in feats_list], kind="stable")
        for i in order:
            buckets.setdefault(self._bucket_of(feats_list[i].shape[0]), []).append(int(i))

        ds, hop = self.hps.downsample, self.acfg.hop_length
        spk_arr = np.asarray(spk_ids, np.int32)[:, None]
        inflight = []
        for tb, idxs in buckets.items():
            prog = self._program(tb)
            cap_b = self._bucket_cap(tb)
            for c0 in range(0, len(idxs), cap_b):
                chunk = idxs[c0 : c0 + cap_b]
                bs_c = self._chunk_batch(len(chunk), cap_b)
                spk_mat = np.tile(spk_arr, (1, bs_c))
                xs = [self._pad_frames(feats_list[i]) for i in chunk]
                tl = np.full(bs_c, tb, np.int32)
                tl[: len(chunk)] = [feats_list[i].shape[0] for i in chunk]
                while len(xs) < bs_c:  # pad batch with dummies
                    xs.append(np.zeros_like(xs[0]))
                x, wlo, wscale = self._wire_batch(xs)
                tl_d = jnp.asarray(tl)
                if self.mesh is not None:
                    x = jax.device_put(x, self._batch_sharding)
                    wlo = jax.device_put(wlo, self._batch_sharding)
                    wscale = jax.device_put(wscale, self._batch_sharding)
                    tl_d = jax.device_put(tl_d, self._batch_sharding)
                inflight.append(
                    (
                        chunk,
                        *prog(
                            self.enc_params, self.dec_params, x, jnp.asarray(spk_mat),
                            t_mean_d, t_std_d, wlo, wscale, tl_d,
                        ),
                    )
                )

        for chunk, packed_d, pcm_d in inflight:
            packed, pcm = np.asarray(packed_d), np.asarray(pcm_d)  # pcm: [n_tgt, B, n]
            units = np.unpackbits(packed, axis=-1)[..., : self.hps.emb_size]
            for j, i in enumerate(chunk):
                t_true = feats_list[i].shape[0]
                units_out[i] = units[j][: -(-t_true // ds)].astype(np.int32)
                for k in range(len(spk_ids)):
                    wavs_out[k][i] = self._pcm_wire_read(pcm[k, j][: max((t_true - 1), 1) * hop])
        return units_out, wavs_out

    def convert_features(self, feats_list: list[np.ndarray], spk_id: int):
        """Single-target convenience wrapper: [(units_i, wav_i)]."""
        units, wavs = self.convert_features_multi(feats_list, [spk_id])
        return list(zip(units, wavs[0]))

    def convert_wavs_multi(
        self,
        wavs: list[np.ndarray],
        spk_ids: list[int],
        tgt_names: list[str] | None = None,
        src_speakers: list[str] | None = None,
        trim: bool = True,
    ):
        """Batch voice conversion STRAIGHT from wavs — the shape of the
        reference's --test stack (SURVEY.md §3.4 reads english/test/*.wav,
        not precomputed features): trim on host, then ONE fused XLA
        program per length bucket runs frontend + encode + decode(all
        targets) + Griffin-Lim. Same returns as convert_features_multi.

        With speaker_norm on, src_speakers defaults to '__global__' stats
        for every utterance — the only well-defined normalization for
        out-of-corpus audio (same contract as convert_wav); pass the real
        source names when the wavs come from corpus speakers.
        """
        acfg, hps = self.acfg, self.hps
        wavs = [np.asarray(w, np.float32) for w in wavs]
        if trim:
            wavs = [trim_silence(w, acfg.top_db) for w in wavs]
        n = len(wavs)
        if self.stats is not None:
            if tgt_names is None:
                raise ValueError(
                    "speaker_norm is on (Converter has stats) but tgt_names "
                    "was not given — conversion would denormalize with the "
                    "WRONG (global) statistics. Pass per-target names, or "
                    "build the Converter with stats=None to opt out."
                )
            if src_speakers is None:
                src_speakers = ["__global__"] * n
            s_mean, s_std = self.stats.arrays_for(src_speakers)
            t_mean, t_std = self.stats.arrays_for(tgt_names)
        else:
            s_mean = np.zeros((n, hps.n_feat), np.float32)
            s_std = np.ones((n, hps.n_feat), np.float32)
            t_mean = np.zeros((len(spk_ids), hps.n_feat), np.float32)
            t_std = np.ones((len(spk_ids), hps.n_feat), np.float32)
        t_mean_d, t_std_d = jnp.asarray(t_mean), jnp.asarray(t_std)

        units_out: list = [None] * n
        wavs_out: list[list] = [[None] * n for _ in spk_ids]
        buckets: dict[int, list[int]] = {}
        for i in np.argsort([-len(w) for w in wavs], kind="stable"):
            t = dsp_audio.n_frames_for(len(wavs[int(i)]), acfg)
            buckets.setdefault(self._bucket_of(t), []).append(int(i))

        ds, hop = hps.downsample, acfg.hop_length
        spk_arr = np.asarray(spk_ids, np.int32)[:, None]
        inflight = []
        for tb, idxs in buckets.items():
            prog = self._wav_program(tb)
            n_samp = tb * hop - 1  # canonical bucket length (pad_to_bucket)
            cap_b = self._bucket_cap(tb)
            for c0 in range(0, len(idxs), cap_b):
                chunk = idxs[c0 : c0 + cap_b]
                bs_c = self._chunk_batch(len(chunk), cap_b)
                spk_mat = np.tile(spk_arr, (1, bs_c))
                pcm = self._pcm_wire_batch(n_samp, bs_c)
                sm = np.zeros((bs_c, hps.n_feat), np.float32)
                ss = np.ones((bs_c, hps.n_feat), np.float32)
                sl = np.full(bs_c, n_samp, np.int32)
                for j, i in enumerate(chunk):
                    w = self._pcm_wire_pack(wavs[i])
                    pcm[j, : len(w)] = w
                    sm[j], ss[j] = s_mean[i], s_std[i]
                    sl[j] = len(w)
                x, sm_d, ss_d, sl_d = (
                    jnp.asarray(pcm), jnp.asarray(sm), jnp.asarray(ss), jnp.asarray(sl),
                )
                if self.mesh is not None:
                    x = jax.device_put(x, self._batch_sharding)
                    sm_d = jax.device_put(sm_d, self._batch_sharding)
                    ss_d = jax.device_put(ss_d, self._batch_sharding)
                    sl_d = jax.device_put(sl_d, self._batch_sharding)
                inflight.append(
                    (
                        chunk,
                        *prog(
                            self.enc_params, self.dec_params, x, jnp.asarray(spk_mat),
                            sm_d, ss_d, t_mean_d, t_std_d, sl_d,
                        ),
                    )
                )

        for chunk, packed_d, pcm_d in inflight:
            packed, pcm = np.asarray(packed_d), np.asarray(pcm_d)
            units = np.unpackbits(packed, axis=-1)[..., : hps.emb_size]
            for j, i in enumerate(chunk):
                t_true = dsp_audio.n_frames_for(len(wavs[i]), acfg)
                units_out[i] = units[j][: -(-t_true // ds)].astype(np.int32)
                for k in range(len(spk_ids)):
                    wavs_out[k][i] = self._pcm_wire_read(pcm[k, j][: max(t_true - 1, 1) * hop])
        return units_out, wavs_out

    def convert_wav(self, wav: np.ndarray, spk_id: int, trim: bool = True, tgt_name=None):
        """Single-utterance VC (ref --test_single, SURVEY.md §3.5).

        The source wav is arbitrary (speaker unknown), so with speaker_norm
        on the input is z-scored with the corpus GLOBAL stats — the only
        well-defined choice for out-of-corpus audio. The target side still
        needs the real target name for correct denormalization."""
        if self.stats is not None and tgt_name is None:
            raise ValueError(
                "speaker_norm is on: convert_wav needs tgt_name to denormalize "
                "with the target speaker's statistics"
            )
        units, wavs = self.convert_wavs_multi(
            [wav],
            [spk_id],
            tgt_names=[tgt_name] if self.stats is not None else None,
            trim=trim,
        )
        return units[0], wavs[0][0]


def _bucket_stats(converter: Converter, true_frames) -> dict:
    """Bucket plan ACTUALLY in effect for these utterance lengths — recorded
    in the conversion result so benchmarks report the executed plan, not a
    separately recomputed one (they can differ, e.g. pre- vs post-trim)."""
    padded = [converter._bucket_of(t) for t in true_frames]
    by_bucket: dict[int, int] = {}
    for tb in padded:
        by_bucket[tb] = by_bucket.get(tb, 0) + 1
    rows_frames, n_disp = 0, 0
    for tb, count in by_bucket.items():
        rows, nd = _chunk_rows(count, converter._bucket_cap(tb))
        rows_frames += rows * tb
        n_disp += nd
    true_total = max(sum(true_frames), 1)
    return {
        "bucket_edges": sorted(by_bucket),
        "padding_overhead": round(sum(padded) / true_total - 1, 4),
        # dummy rows run the full program (the vocoder does not mask), so
        # executed rows*frames — tail-shape rounding included — is the cost
        # the device actually pays; mesh data-axis round-up not modeled
        "executed_overhead": round(rows_frames / true_total - 1, 4),
        "n_dispatches": n_disp,
    }


def convert_corpus(
    converter: Converter,
    dataset_path: str | Path,
    result_dir: str | Path,
    target_speakers: dict[str, int],
    split: str = "test",
    sr: int = 16000,
    limit: int | None = None,
    units_only: bool = False,
    progress=None,
    adaptive_buckets: int | None = None,
    bucket_overhead_target: float | None = None,
    bucket_cost_model: str = "frames",
    dispatch_cost_frames: float = 0.0,
) -> dict:
    """Corpus-wide conversion + unit extraction (ref --test, SURVEY.md §3.4).

    Reads precomputed lin features from the h5 corpus, writes
    ``<result>/units/<utt>.txt`` once per utterance and
    ``<result>/<target>/<utt>.wav`` per target speaker.
    ``adaptive_buckets=K`` fits <=K bucket edges to the corpus length
    histogram before converting (less padding, same program count).
    """
    result_dir = Path(result_dir)
    feats, names, srcs = [], [], []
    with h5py.File(dataset_path, "r") as f:
        if split not in f:
            raise ValueError(f"split {split!r} not in {dataset_path}")
        for spk in f[split]:
            for utt in f[split][spk]:
                feats.append(f[f"{split}/{spk}/{utt}/{converter.feat}"][:])
                names.append(utt)
                srcs.append(spk)
                if limit and len(names) >= limit:
                    break
            if limit and len(names) >= limit:
                break

    n_wav = 0
    tgt_names = list(target_speakers)
    # adaptive edges are scoped to THIS corpus: fitted edges must not
    # silently govern later conversions on the same Converter (whose
    # program cache is keyed by shape and survives either way)
    prev_edges = converter.bucket_edges
    bucket_stats = {}
    try:
        if adaptive_buckets:
            converter.fit_buckets(
                [f.shape[0] for f in feats], adaptive_buckets,
                target_overhead=bucket_overhead_target,
                cost_model=bucket_cost_model,
                dispatch_cost_frames=dispatch_cost_frames,
            )
            bucket_stats = _bucket_stats(converter, [f.shape[0] for f in feats])
        if units_only:
            units_list = converter.encode_units(feats, src_speakers=srcs)
            for utt, units in zip(names, units_list):
                write_units(result_dir / "units" / f"{utt}.txt", units)
            return {
                "n_utterances": len(names), "n_wavs": 0,
                "result_dir": str(result_dir), **bucket_stats,
            }
        units_list, wavs_per_tgt = converter.convert_features_multi(
            feats, [target_speakers[t] for t in tgt_names], tgt_names=tgt_names, src_speakers=srcs
        )
    finally:
        converter.bucket_edges = prev_edges
    for utt, units in zip(names, units_list):
        write_units(result_dir / "units" / f"{utt}.txt", units)
    for k, tgt_name in enumerate(tgt_names):
        for utt, wav in zip(names, wavs_per_tgt[k]):
            save_wav(result_dir / tgt_name / f"{utt}.wav", wav, sr)
            n_wav += 1
            if progress:
                progress(tgt_name, utt)
    return {
        "n_utterances": len(names), "n_wavs": n_wav,
        "result_dir": str(result_dir), **bucket_stats,
    }


def convert_wav_dir(
    converter: Converter,
    wav_dir: str | Path,
    result_dir: str | Path,
    target_speakers: dict[str, int],
    sr: int = 16000,
    limit: int | None = None,
    units_only: bool = False,
    progress=None,
    adaptive_buckets: int | None = None,
    bucket_overhead_target: float | None = None,
    bucket_cost_model: str = "frames",
    dispatch_cost_frames: float = 0.0,
) -> dict:
    """Corpus conversion straight from a directory of wavs — the literal
    shape of the reference --test stack (SURVEY.md §3.4 iterates
    english/test/*.wav). No preprocessed h5 needed for the features; the
    fused PCM-in program computes them on-device. Source speakers are
    unknown for a flat test dir, so speaker_norm (if on) uses the corpus
    GLOBAL statistics (the convert_wav contract). ``adaptive_buckets=K``
    fits <=K bucket edges to the (post-trim) length histogram first."""
    result_dir = Path(result_dir)
    wav_paths = sorted(Path(wav_dir).glob("*.wav"))
    if limit:
        wav_paths = wav_paths[:limit]
    if not wav_paths:
        raise ValueError(f"no .wav files in {wav_dir}")
    ys = [load_wav(p, sr) for p in wav_paths]
    names = [p.stem for p in wav_paths]
    tgt_names = list(target_speakers)
    trim = True
    prev_edges = converter.bucket_edges  # scope fitted edges to this corpus
    bucket_stats = {}
    try:
        if adaptive_buckets:
            # fit on the lengths the programs will actually see: trim here
            # once and skip the (idempotent) trim inside the conversion call
            ys = [trim_silence(y, converter.acfg.top_db) for y in ys]
            trim = False
            true_frames = [dsp_audio.n_frames_for(len(y), converter.acfg) for y in ys]
            converter.fit_buckets(
                true_frames, adaptive_buckets, target_overhead=bucket_overhead_target,
                cost_model=bucket_cost_model,
                dispatch_cost_frames=dispatch_cost_frames,
            )
            bucket_stats = _bucket_stats(converter, true_frames)
        if units_only:
            units_list = converter.encode_units_from_wavs(ys, trim=trim)
            for utt, units in zip(names, units_list):
                write_units(result_dir / "units" / f"{utt}.txt", units)
            return {
                "n_utterances": len(names), "n_wavs": 0,
                "result_dir": str(result_dir), **bucket_stats,
            }
        units_list, wavs_per_tgt = converter.convert_wavs_multi(
            ys,
            [target_speakers[t] for t in tgt_names],
            tgt_names=tgt_names if converter.stats is not None else None,
            trim=trim,
        )
    finally:
        converter.bucket_edges = prev_edges
    for utt, units in zip(names, units_list):
        write_units(result_dir / "units" / f"{utt}.txt", units)
    n_wav = 0
    for k, tgt_name in enumerate(tgt_names):
        for utt, wav in zip(names, wavs_per_tgt[k]):
            save_wav(result_dir / tgt_name / f"{utt}.wav", wav, sr)
            n_wav += 1
            if progress:
                progress(tgt_name, utt)
    return {
        "n_utterances": len(names), "n_wavs": n_wav,
        "result_dir": str(result_dir), **bucket_stats,
    }


def convert_single(
    converter: Converter,
    wav_path: str | Path,
    target: str,
    target_id: int,
    result_dir: str | Path,
    sr: int | None = None,
) -> dict:
    """Single (source wav, target speaker) demo path (ref --test_single)."""
    sr = sr or converter.acfg.sr
    y = load_wav(wav_path, sr)
    units, wav = converter.convert_wav(y, target_id, tgt_name=target)
    result_dir = Path(result_dir)
    stem = Path(wav_path).stem
    write_units(result_dir / "units" / f"{stem}.txt", units)
    out = result_dir / target / f"{stem}.wav"
    save_wav(out, wav, sr)
    return {"units": str(result_dir / "units" / f"{stem}.txt"), "wav": str(out)}
