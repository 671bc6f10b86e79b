#!/usr/bin/env python
"""Per-stage device-resident timing of the batch-32 conversion program
(VERDICT r3 ask 1: find where the non-GL ~46 ms goes).

Method: CUMULATIVE programs — frontend, frontend+encode,
frontend+encode+decode, and the full program — each timed with the
bench's forced-readback method (one distinct staged buffer set per rep,
fetch one element of every output). Successive differences attribute
time to a stage while the per-dispatch overhead cancels.

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
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--utts", type=int, default=32)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--gl-iters", type=int, default=100)
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
                     batch_size=n_utts, compute_dtype="bfloat16", pcm_wire="mulaw")

    # ---- staged inputs (bench.py staging: force transfers before timing)
    sm = np.zeros((n_utts, hps.n_feat), np.float32)
    ss = np.ones((n_utts, hps.n_feat), np.float32)
    tm = np.zeros((1, hps.n_feat), np.float32)
    tsd = np.ones((1, hps.n_feat), np.float32)
    spk_mat = np.zeros((1, n_utts), np.int32)

    def stage(rot):
        pcm = conv._pcm_wire_batch(n_samp)
        sl = np.full(n_utts, n_samp, np.int32)
        for j in range(n_utts):
            w = conv._pcm_wire_pack(wavs[(j + rot) % n_utts])
            pcm[j, : len(w)] = w
            sl[j] = len(w)
        arrs = (jnp.asarray(pcm), jnp.asarray(spk_mat), jnp.asarray(sm), jnp.asarray(ss),
                jnp.asarray(tm), jnp.asarray(tsd), jnp.asarray(sl))
        for a in arrs:
            float(jnp.ravel(a)[0])
        return arrs

    def _force(out):
        for leaf in jax.tree.leaves(out):
            float(jnp.ravel(leaf)[0])

    def time_prog(fn, n_reps):
        sets = [stage(r) for r in range(n_reps + 1)]
        _force(fn(*sets[-1]))  # compile + warm
        t0 = time.perf_counter()
        outs = [fn(*s) for s in sets[:n_reps]]
        for o in outs:
            _force(o)
        return (time.perf_counter() - t0) / n_reps

    # ---- cumulative stage programs (mirror Converter._wav_program's body)
    cd = conv.compute_dtype
    fe_method = dsp_audio.resolve_method(acfg, None)
    gl_method = conv._gl_method(n_frames)

    def frontend(pcm, spk, src_mean, src_std, tgt_mean, tgt_std, slens):
        y = conv._pcm_wire_expand(pcm)
        mel, mag = jax.vmap(
            lambda w, sl: dsp_audio.wav_to_features(w, acfg, method=fe_method, length=sl)
        )(y, slens)
        x = (mag - src_mean[:, None, :]) / src_std[:, None, :]
        tlens = 1 + slens // acfg.hop_length
        return x, tlens

    def encode(*a):
        x, tlens = frontend(*a)
        logits = conv.encoder.apply(conv.enc_params, x.astype(conv.encoder_dtype),
                                    lengths=tlens).astype(jnp.float32)
        units = unit_bits(logits, hps.enc_mode)
        return jnp.packbits(units.astype(jnp.uint8), axis=-1), tlens

    def decode(*a):
        pcm, spk, src_mean, src_std, tgt_mean, tgt_std, slens = a
        x, tlens = frontend(*a)
        logits = conv.encoder.apply(conv.enc_params, x.astype(conv.encoder_dtype),
                                    lengths=tlens).astype(jnp.float32)
        units = unit_bits(logits, hps.enc_mode)
        z = units.astype(cd)
        zlens = (tlens + hps.downsample - 1) // hps.downsample
        dec_p = jax.tree.map(
            lambda p: p.astype(cd) if p.dtype == jnp.float32 else p, conv.dec_params)

        def dec_one(spk_row, mean_row, std_row):
            xh = conv.decoder.apply(dec_p, z, spk_row, lengths=zlens).astype(jnp.float32)
            return jnp.clip(xh * std_row[None, None, :] + mean_row[None, None, :], 0.0, 1.0)

        return jax.vmap(dec_one)(spk, tgt_mean, tgt_std)

    full = conv._wav_program(n_frames)

    print(f"gl_method={gl_method} fe_method={fe_method} compute={cd}", file=sys.stderr)
    results = {}
    t_fe = time_prog(jax.jit(frontend), args.reps)
    print(f"frontend:           {t_fe*1e3:8.2f} ms", file=sys.stderr)
    t_enc = time_prog(jax.jit(encode), args.reps)
    print(f"+encode:            {t_enc*1e3:8.2f} ms  (enc = {(t_enc-t_fe)*1e3:.2f})",
          file=sys.stderr)
    t_dec = time_prog(jax.jit(decode), args.reps)
    print(f"+decode(2 tgt):     {t_dec*1e3:8.2f} ms  (dec = {(t_dec-t_enc)*1e3:.2f})",
          file=sys.stderr)
    t_full = time_prog(lambda *a: full(conv.enc_params, conv.dec_params, *a), args.reps)
    print(f"full (GL-{args.gl_iters}):      {t_full*1e3:8.2f} ms  "
          f"(gl+pcm = {(t_full-t_dec)*1e3:.2f})", file=sys.stderr)

    results = {
        "n_utts": n_utts, "n_frames": n_frames, "gl_iters": args.gl_iters,
        "gl_method": gl_method, "compute_dtype": str(cd), "reps": args.reps,
        "frontend_ms": round(t_fe * 1e3, 2),
        "cum_encode_ms": round(t_enc * 1e3, 2),
        "cum_decode_ms": round(t_dec * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "stage_encoder_ms": round((t_enc - t_fe) * 1e3, 2),
        "stage_decoder_ms": round((t_dec - t_enc) * 1e3, 2),
        "stage_gl_pcm_ms": round((t_full - t_dec) * 1e3, 2),
        "platform": jax.devices()[0].platform,
    }
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
