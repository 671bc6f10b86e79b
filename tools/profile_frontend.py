#!/usr/bin/env python
"""Sub-stage timing of the batched PCM-in frontend (the 42 ms of the 90 ms
batch-32 conversion program found by tools/profile_stages.py).

Times cumulative prefixes of the frontend pipeline as isolated programs
(each summed to one scalar so no stage materializes an output the fused
program would not), plus a flattened-batch Pallas-kernel variant:

    expand     : mu-law LUT expand of the PCM wire
    preemph    : + preemphasis
    segments   : + dynamic-length mirror pad + hop framing  (gather)
    stft       : + windowed-DFT matmuls (re, im)
    full       : + mag/mel/dB-norm (== wav_to_features 'fused')
    pallas     : expand+preemph+segments -> ONE fused_frontend_pallas call
                 over the flattened [B*T, win] segment matrix

Writes docs/frontend_profile.json.
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
    ap.add_argument("-o", "--out", default=str(REPO / "docs" / "frontend_profile.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zerospeech_tts_tpu.config import AudioConfig, Hps
    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.dsp import audio as dsp_audio
    from zerospeech_tts_tpu.models import Decoder, Encoder

    hps = Hps()
    acfg = AudioConfig()
    n_utts, n_frames = args.utts, args.frames
    hop = acfg.hop_length
    n_samp = n_frames * hop - 1

    k = jax.random.PRNGKey(0)
    enc, dec = Encoder(hps), Decoder(hps)
    x0 = np.zeros((1, hps.seg_len, hps.n_feat), np.float32)
    enc_params = enc.init(k, x0)
    dec_params = dec.init(
        k, np.zeros((1, hps.n_bins, hps.emb_size), np.float32), np.zeros((1,), np.int32))
    conv = Converter(hps, acfg, enc_params, dec_params, batch_size=n_utts,
                     compute_dtype="bfloat16", pcm_wire="mulaw")

    rng = np.random.default_rng(0)
    wavs = [
        (0.4 * np.sin(2 * np.pi * (150 + 20 * i) * np.arange(n_samp) / acfg.sr)
         + 0.01 * rng.standard_normal(n_samp)).astype(np.float32)
        for i in range(n_utts)
    ]

    def _force(out):
        for leaf in jax.tree.leaves(out):
            float(jnp.ravel(leaf)[0])

    def _stage(arrs):
        out = tuple(jnp.asarray(a) for a in arrs)
        for a in out:
            float(jnp.ravel(a)[0])
        return out

    def mk(rot):
        pcm = conv._pcm_wire_batch(n_samp)
        sl = np.full(n_utts, n_samp, np.int32)
        for j in range(n_utts):
            w = conv._pcm_wire_pack(wavs[(j + rot) % n_utts])
            pcm[j, : len(w)] = w
            sl[j] = len(w)
        return _stage((pcm, sl))

    def time_prog(fn, n_reps):
        sets = [mk(r) for r in range(n_reps + 1)]
        _force(fn(*sets[-1]))
        t0 = time.perf_counter()
        outs = [fn(*s) for s in sets[:n_reps]]
        _force(outs[-1])
        return (time.perf_counter() - t0) / n_reps

    fe = dsp_audio.resolve_method(acfg, None)

    def seg_of(w, sl):
        yp = dsp_audio.preemphasis(w, acfg.preemphasis)
        return dsp_audio._fused_segments(yp, acfg, sl)

    progs = {}

    @jax.jit
    def p_expand(pcm, sl):
        return jnp.sum(conv._pcm_wire_expand(pcm), dtype=jnp.float32)

    progs["expand"] = p_expand

    @jax.jit
    def p_preemph(pcm, sl):
        y = conv._pcm_wire_expand(pcm)
        return jnp.sum(jax.vmap(lambda w: dsp_audio.preemphasis(w, acfg.preemphasis))(y),
                       dtype=jnp.float32)

    progs["preemph"] = p_preemph

    @jax.jit
    def p_segments(pcm, sl):
        y = conv._pcm_wire_expand(pcm)
        segs = jax.vmap(seg_of)(y, sl)
        return jnp.sum(segs, dtype=jnp.float32)

    progs["segments"] = p_segments

    @jax.jit
    def p_segments_static(pcm, sl):
        # static-length mirror pad (length=None): isolates the cost of the
        # traced-length reflection GATHER vs plain reflect padding
        y = conv._pcm_wire_expand(pcm)
        segs = jax.vmap(lambda w: dsp_audio._fused_segments(
            dsp_audio.preemphasis(w, acfg.preemphasis), acfg, None))(y)
        return jnp.sum(segs, dtype=jnp.float32)

    progs["segments_static"] = p_segments_static

    @jax.jit
    def p_stft(pcm, sl):
        y = conv._pcm_wire_expand(pcm)
        re, im = jax.vmap(lambda w, s: dsp_audio.stft(
            dsp_audio.preemphasis(w, acfg.preemphasis), acfg, method=fe, length=s))(y, sl)
        return jnp.sum(re, dtype=jnp.float32) + jnp.sum(im, dtype=jnp.float32)

    progs["stft"] = p_stft

    @jax.jit
    def p_full(pcm, sl):
        y = conv._pcm_wire_expand(pcm)
        mel, mag = jax.vmap(lambda w, s: dsp_audio.wav_to_features(
            w, acfg, method=fe, length=s))(y, sl)
        return jnp.sum(mel, dtype=jnp.float32) + jnp.sum(mag, dtype=jnp.float32)

    progs["full_fused"] = p_full

    from zerospeech_tts_tpu.ops.pallas_frontend import fused_frontend_pallas

    @jax.jit
    def p_pallas(pcm, sl):
        y = conv._pcm_wire_expand(pcm)
        segs = jax.vmap(seg_of)(y, sl)  # [B, T, win]
        b, t, w = segs.shape
        mel, mag = fused_frontend_pallas(segs.reshape(b * t, w), acfg)
        return jnp.sum(mel, dtype=jnp.float32) + jnp.sum(mag, dtype=jnp.float32)

    progs["full_pallas_flat"] = p_pallas

    results = {"n_utts": n_utts, "n_frames": n_frames, "reps": args.reps,
               "platform": jax.devices()[0].platform}
    for name, fn in progs.items():
        dt = time_prog(fn, args.reps)
        results[f"{name}_ms"] = round(dt * 1e3, 2)
        print(f"{name:20s}: {dt*1e3:8.2f} ms", file=sys.stderr)

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
