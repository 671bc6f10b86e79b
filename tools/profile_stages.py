#!/usr/bin/env python
"""Per-stage device-resident timing of the batch-32 conversion program
(VERDICT r3 ask 1: find where the non-GL ~46 ms goes).

Method: ISOLATED stage programs — each stage jitted alone with its real
inputs pre-staged on device (frontend: PCM wire -> normalized features;
encoder: features -> packed units; decoder: units -> denormalized
magnitudes; vocoder: magnitudes -> PCM16), timed with the bench's
discipline (one distinct staged buffer set per rep, force only the
LAST dispatch — see time_prog). The full program is timed the
same way as an anchor; `sum_stages_ms` vs `full_ms` is the fusion /
overlap consistency check (full < sum when XLA fuses across a stage
boundary the isolated programs must materialize).

An earlier revision of this tool used CUMULATIVE programs and
differenced them; that attribution was confounded — the frontend-only
program materializes a [B, T, F] f32 output that the fused programs
never write, producing *negative* stage deltas. Isolated stages have no
such confound.

Also times the two serial GRU scans alone (encoder BiGRU at the latent
rate, decoder GRU at the frame rate) — the suspected latency floor of
the non-GL time — plus the same scans with `gru_impl` swapped, so the
Pallas scan kernel can be A/B'd directly.

Writes docs/convert_stage_profile.json.

    python tools/profile_stages.py [--reps 6] [--utts 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--utts", type=int, default=32)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--gl-iters", type=int, default=100)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--gru-impl", default="auto", choices=("auto", "scan", "pallas"))
    ap.add_argument("-o", "--out", default=str(REPO / "docs" / "convert_stage_profile.json"))
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/zstts_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from zerospeech_tts_tpu.config import AudioConfig, Hps
    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.dsp import audio as dsp_audio
    from zerospeech_tts_tpu.models import Decoder, Encoder, unit_bits

    hps = Hps()
    acfg = AudioConfig(gl_iters=args.gl_iters)
    n_utts, n_frames = args.utts, args.frames
    hop = acfg.hop_length
    n_samp = n_frames * hop - 1

    rng = np.random.default_rng(0)
    wavs = []
    for i in range(n_utts):
        t = np.arange(n_samp) / acfg.sr
        f0 = 150 + 20 * i
        y = (0.4 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 3 * f0 * t)
             + 0.01 * rng.standard_normal(n_samp)).astype(np.float32)
        wavs.append(y)

    k = jax.random.PRNGKey(0)
    enc, dec = Encoder(hps), Decoder(hps)
    x0 = np.zeros((1, hps.seg_len, hps.n_feat), np.float32)
    enc_params = enc.init(k, x0)
    dec_params = dec.init(
        k, np.zeros((1, hps.n_bins, hps.emb_size), np.float32), np.zeros((1,), np.int32))

    conv = Converter(hps, acfg, enc_params, dec_params, gl_iters=args.gl_iters,
                     batch_size=n_utts, compute_dtype=args.compute_dtype, pcm_wire="mulaw",
                     gru_impl=None if args.gru_impl == "auto" else args.gru_impl)
    cd, ed = conv.compute_dtype, conv.encoder_dtype
    fe_method = dsp_audio.resolve_method(acfg, None)
    gl_method = conv._gl_method(n_frames)
    n_lat = n_frames // hps.downsample

    # ---------------------------------------------------------- timing core
    def _stage_arrays(arrs):
        """Move numpy arrays to device and force the transfers."""
        out = tuple(jnp.asarray(a) for a in arrs)
        for a in out:
            float(jnp.ravel(a)[0])
        return out

    def _force(out):
        for leaf in jax.tree.leaves(out):
            float(jnp.ravel(leaf)[0])

    def time_prog(fn, make_set, n_reps):
        """Mean-of-reps time of fn over distinct pre-staged input sets.
        Forces ONLY the last dispatch: each scalar fetch on the tunneled
        platform is a blocking ~28 ms roundtrip issued serially, so
        forcing every rep adds ~28 ms/call of readback latency to the
        timed region (the round-3 bug that created the phantom "46 ms
        non-GL gap"). FIFO per-client execution makes the last fetch
        force the whole sequence; residual bias = one roundtrip / n_reps,
        always making reported time LONGER."""
        sets = [make_set(r) for r in range(n_reps + 1)]
        _force(fn(*sets[-1]))  # compile + warm
        t0 = time.perf_counter()
        outs = [fn(*s) for s in sets[:n_reps]]
        _force(outs[-1])
        return (time.perf_counter() - t0) / n_reps

    # ---------------------------------------------------------- input sets
    sm = np.zeros((n_utts, hps.n_feat), np.float32)
    ss = np.ones((n_utts, hps.n_feat), np.float32)
    tm = np.zeros((1, hps.n_feat), np.float32)
    tsd = np.ones((1, hps.n_feat), np.float32)
    spk_mat = np.zeros((1, n_utts), np.int32)

    def full_set(rot):
        pcm = conv._pcm_wire_batch(n_samp)
        sl = np.full(n_utts, n_samp, np.int32)
        for j in range(n_utts):
            w = conv._pcm_wire_pack(wavs[(j + rot) % n_utts])
            pcm[j, : len(w)] = w
            sl[j] = len(w)
        return _stage_arrays((pcm, spk_mat, sm, ss, tm, tsd, sl))

    tlens_np = np.full(n_utts, n_frames, np.int32)
    zlens_np = np.full(n_utts, n_lat, np.int32)

    def feat_set(rot):
        r = np.random.default_rng(100 + rot)
        x = r.uniform(0.0, 1.0, (n_utts, n_frames, hps.n_feat)).astype(np.float32)
        return _stage_arrays((x, tlens_np))

    def unit_set(rot):
        r = np.random.default_rng(200 + rot)
        z = (r.uniform(size=(n_utts, n_lat, hps.emb_size)) < 0.5)
        return _stage_arrays((z.astype(np.dtype(cd)), zlens_np))

    def mag_set(rot):
        r = np.random.default_rng(300 + rot)
        xh = r.uniform(0.0, 1.0, (1, n_utts, n_frames, hps.n_feat)).astype(np.float32)
        return _stage_arrays((xh,))

    # ---------------------------------------------------------- stage progs
    @jax.jit
    def frontend(pcm, spk, src_mean, src_std, tgt_mean, tgt_std, slens):
        y = conv._pcm_wire_expand(pcm)
        mel, mag = jax.vmap(
            lambda w, sl: dsp_audio.wav_to_features(w, acfg, method=fe_method, length=sl)
        )(y, slens)
        x = (mag - src_mean[:, None, :]) / src_std[:, None, :]
        # sum instead of returning x: the fused program never materializes
        # the [B, T, F] features, so an isolated frontend must not either
        return jnp.sum(x, dtype=jnp.float32), 1 + slens // acfg.hop_length

    enc_p_cast = jax.tree.map(
        lambda p: p.astype(ed) if p.dtype == jnp.float32 else p, conv.enc_params)
    dec_p_cast = jax.tree.map(
        lambda p: p.astype(cd) if p.dtype == jnp.float32 else p, conv.dec_params)

    @jax.jit
    def encode(x, tlens):
        logits = conv.encoder.apply(
            enc_p_cast, x.astype(ed), lengths=tlens).astype(jnp.float32)
        units = unit_bits(logits, hps.enc_mode)
        return jnp.packbits(units.astype(jnp.uint8), axis=-1)

    @jax.jit
    def decode(z, zlens):
        def dec_one(spk_row, mean_row, std_row):
            xh = conv.decoder.apply(dec_p_cast, z, spk_row, lengths=zlens).astype(jnp.float32)
            return jnp.clip(xh * std_row[None, None, :] + mean_row[None, None, :], 0.0, 1.0)

        return jax.vmap(dec_one)(jnp.asarray(spk_mat), jnp.asarray(tm), jnp.asarray(tsd))

    @jax.jit
    def vocode(xh):
        def voc_one(m):
            wav = dsp_audio.spectrogram2wav(
                m, acfg, n_iters=args.gl_iters,
                method="pallas" if gl_method == "pallas_seq" else gl_method)
            return wav

        pcm = jax.vmap(jax.vmap(voc_one))(xh)
        from zerospeech_tts_tpu.dsp.mulaw import mulaw_compress_device

        return mulaw_compress_device(jnp.clip(pcm, -1.0, 1.0))

    full = conv._wav_program(n_frames)

    print(f"gl_method={gl_method} fe_method={fe_method} compute={cd} enc={ed}",
          file=sys.stderr)
    t_full = time_prog(
        lambda *a: full(conv.enc_params, conv.dec_params, *a), full_set, args.reps)
    print(f"full (GL-{args.gl_iters}): {t_full*1e3:8.2f} ms", file=sys.stderr)
    t_fe = time_prog(frontend, full_set, args.reps)
    print(f"frontend:        {t_fe*1e3:8.2f} ms", file=sys.stderr)
    t_enc = time_prog(encode, feat_set, args.reps)
    print(f"encoder:         {t_enc*1e3:8.2f} ms", file=sys.stderr)
    t_dec = time_prog(decode, unit_set, args.reps)
    print(f"decoder(1 tgt):  {t_dec*1e3:8.2f} ms", file=sys.stderr)
    t_voc = time_prog(vocode, mag_set, args.reps)
    print(f"vocoder GL+pcm:  {t_voc*1e3:8.2f} ms", file=sys.stderr)

    # ---------------------------------------------------- GRU scans alone
    from zerospeech_tts_tpu.models.layers import GRU, BiGRU

    def time_gru(mod, b, t, feat_in, tag):
        m_params = mod.init(jax.random.PRNGKey(1), np.zeros((b, t, feat_in), np.float32))
        # cast params to the compute dtype exactly like the Converter does:
        # uncast f32 params over bf16 inputs would promote the whole scan to
        # f32 (mis-measuring) and fail pallas_gru_supported's dtype check
        m_params = jax.tree.map(
            lambda p: p.astype(cd) if p.dtype == jnp.float32 else p, m_params)

        @jax.jit
        def run(x):
            return mod.apply(m_params, x.astype(cd))

        def mk(rot):
            r = np.random.default_rng(400 + rot)
            return _stage_arrays((r.standard_normal((b, t, feat_in)).astype(np.float32),))

        dt = time_prog(run, mk, args.reps)
        print(f"{tag}: {dt*1e3:8.2f} ms", file=sys.stderr)
        return dt

    gru_ms = {}
    for impl in ("scan", "pallas"):
        # encoder BiGRU: input [B, T/8, emb], hidden emb/2 each direction
        gru_ms[f"enc_bigru_{impl}_ms"] = round(1e3 * time_gru(
            BiGRU(hps.emb_size // 2, impl=impl), n_utts, n_lat, hps.emb_size,
            f"enc BiGRU/{impl}  [B={n_utts},T={n_lat},H={hps.emb_size // 2}]"), 2)
        # decoder GRU at the folded cross-target batch: input
        # [B*n_tgt, T, conv+spk_emb], hidden conv_channels
        gru_ms[f"dec_gru_{impl}_ms"] = round(1e3 * time_gru(
            GRU(hps.conv_channels, impl=impl), n_utts, n_frames,
            hps.conv_channels + hps.spk_emb_size,
            f"dec GRU/{impl}    [B={n_utts},T={n_frames},H={hps.conv_channels}]"), 2)

    results = {
        "n_utts": n_utts, "n_frames": n_frames, "gl_iters": args.gl_iters,
        "gl_method": gl_method, "compute_dtype": str(cd), "reps": args.reps,
        "method": "isolated stage programs, device-staged inputs, forced readback",
        "full_ms": round(t_full * 1e3, 2),
        "stage_frontend_ms": round(t_fe * 1e3, 2),
        "stage_encoder_ms": round(t_enc * 1e3, 2),
        "stage_decoder_ms": round(t_dec * 1e3, 2),
        "stage_vocoder_ms": round(t_voc * 1e3, 2),
        "sum_stages_ms": round((t_fe + t_enc + t_dec + t_voc) * 1e3, 2),
        **gru_ms,
        "platform": jax.devices()[0].platform,
    }
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
