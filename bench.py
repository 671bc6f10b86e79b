"""Headline benchmark (BASELINE.json north-star): corpus conversion
throughput — PCM in -> on-device frontend -> encode -> MBV-binarize ->
decode(target speaker) -> Griffin-Lim -> PCM16 out, one fused XLA
program — in utterances/sec/chip, vs the reference's CPU
librosa/numpy-style Griffin-Lim path (SURVEY.md §3.4: the reference stack
is CPU-GL-dominated; no published number exists, so the baseline is
measured in-process with an equivalent numpy implementation and is a
LOWER bound on reference cost — the timed TPU side covers strictly more
of the stack).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _numpy_reference_gl(mag: np.ndarray, cfg, n_iters: int) -> np.ndarray:
    """The reference's vocoder path: plain Griffin-Lim with numpy FFTs
    (librosa-equivalent semantics: same window/center/norm as our jitted
    version, zero-phase init, no momentum)."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    win = np.zeros(n_fft, np.float64)
    n = np.arange(cfg.win_length)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * n / cfg.win_length)
    lpad = (n_fft - cfg.win_length) // 2
    win[lpad : lpad + cfg.win_length] = w

    t = mag.shape[0]
    out_len = (t - 1) * hop + n_fft
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    wss = np.zeros(out_len)
    np.add.at(wss, idx, win[None, :] ** 2)
    wss = np.where(wss > 1e-11, wss, 1.0)

    def istft(spec):
        frames = np.fft.irfft(spec, n=n_fft, axis=-1) * win
        y = np.zeros(out_len)
        np.add.at(y, idx, frames)
        y = y / wss
        return y[n_fft // 2 : -(n_fft // 2)]

    def stft(y):
        pad = n_fft // 2
        ypad = np.pad(y, (pad, pad), mode="reflect")
        fr = ypad[idx] * win
        return np.fft.rfft(fr, n=n_fft, axis=-1)

    spec = mag.astype(np.complex128)
    for _ in range(n_iters):
        x = istft(spec)
        est = stft(x)
        phase = est / np.maximum(np.abs(est), 1e-8)
        spec = mag * phase
    return istft(spec)


def main():
    import jax

    # persistent compile cache: the bench's wall time is compile-dominated
    # (batch-16 GL-100 program + train_many); repeat runs skip it entirely
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/zstts_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: cache flags absent

    from zerospeech_tts_tpu.config import AudioConfig, Hps
    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.dsp import audio as dsp_audio
    from zerospeech_tts_tpu.models import Decoder, Encoder

    quick = "--quick" in sys.argv

    hps = Hps()  # flagship geometry (seg 128 / 513 feat / 1024-bit MBV)
    acfg = AudioConfig()
    platform = jax.devices()[0].platform
    # 32 utterances per pass: one batch-32 program amortizes the ~100 ms
    # tunnel dispatch best (same-session ladder: batch 4/8/16/32 -> 37.2 /
    # 64.5 / 88.7 / 109.0 utt/s; batch 64 compiles >35 min — rejected)
    n_utts = 32 if not quick else 4
    n_frames = 512  # ~6.4 s of audio per utterance
    gl_iters = acfg.gl_iters  # 100, matching the reference default

    # synthetic utterances; features only for the fidelity reference below
    rng = np.random.default_rng(0)
    sr = acfg.sr
    wavs, feats = [], []
    for i in range(n_utts):
        n = (n_frames - 1) * acfg.hop_length
        t = np.arange(n) / sr
        f0 = 150 + 20 * i
        y = (
            0.4 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 3 * f0 * t)
            + 0.01 * rng.standard_normal(n)
        ).astype(np.float32)
        wavs.append(y)
        _, lin = dsp_audio.get_spectrograms(y, acfg, bucket_frames=64)
        feats.append(lin)

    # flagship model params (random init — conversion cost is arch-dependent,
    # not weight-dependent)
    k = jax.random.PRNGKey(0)
    enc, dec = Encoder(hps), Decoder(hps)
    x0 = np.zeros((1, hps.seg_len, hps.n_feat), np.float32)
    enc_params = enc.init(k, x0)
    dec_params = dec.init(
        k, np.zeros((1, hps.n_bins, hps.emb_size), np.float32), np.zeros((1,), np.int32)
    )
    # bench configuration = the deployment configuration: the fused PCM-in
    # program (on-device f32 frontend, bf16 model matmuls) — strictly MORE
    # covered work than the feature path (the frontend is inside the timed
    # program) and still faster on this wire-bound host (same-session A/B:
    # 38.7 vs 33.0 utt/s median; agreement 0.9987) — with 8-bit mu-law
    # companding on both PCM wire directions (files on disk stay PCM16;
    # same-session A/B vs the int16 wire: 86.6 vs 53.3 utt/s median,
    # units agreement 0.9908, companding SNR ~38 dB, recorded below).
    # one program for the whole pass (batch = n_utts): a single dispatch
    # and readback ride the contended tunnel measurably better than two
    # half-batches (28.5 -> 41.2 utt/s in a same-process A/B under load)
    conv = Converter(
        hps, acfg, enc_params, dec_params, gl_iters=gl_iters,
        batch_size=n_utts, compute_dtype="bfloat16", pcm_wire="mulaw",
    )

    # warmup (compile), then MEDIAN of n_passes timed passes — a single
    # tunnel hiccup must not torpedo the recorded artifact (VERDICT r1)
    n_passes = 1 if quick else 5
    conv.convert_wavs_multi(wavs[:1], [0], trim=False)
    times = []
    for p in range(n_passes):
        t0 = time.perf_counter()
        units_list, wavs_out = conv.convert_wavs_multi(wavs, [0], trim=False)
        times.append(time.perf_counter() - t0)
        print(f"pass {p}: {n_utts / times[-1]:.1f} utt/s", file=sys.stderr)
    dt = float(np.median(times))
    utt_per_sec = n_utts / dt
    audio_seconds = sum(len(w) for w in wavs_out[0]) / sr
    rtf = audio_seconds / dt  # >1 means faster than realtime

    # fidelity evidence for the bench configuration: units vs the f32
    # host-feature path (4 utterances and GL-2 keep the one-off compile small)
    n_chk = min(4, n_utts)
    conv_f32 = Converter(hps, acfg, enc_params, dec_params, gl_iters=2, batch_size=n_chk)
    u_fast = units_list[:n_chk]
    u_ref = [u for u, _ in conv_f32.convert_features(feats[:n_chk], 0)]
    units_agreement = float(np.mean([(a == b).mean() for a, b in zip(u_fast, u_ref)]))

    # down-wire sanity: mu-law RE-quantization SNR on the bench's own
    # output audio. NB: the output already crossed the companded wire
    # once, so a second roundtrip is near-idempotent and this reads HIGH
    # (~70 dB) — it catches codec bugs, not companding noise. The true
    # isolated companding SNR (~38 dB, identical GL, int16 vs mulaw
    # down-wire) is asserted >30 dB in
    # tests/test_parallel.py::test_mulaw_pcm_wire_converter.
    from zerospeech_tts_tpu.dsp.mulaw import mulaw_compress_host, mulaw_expand_host

    _ref = np.concatenate([w.astype(np.float64) for w in wavs_out[0][:n_chk]]) / 32768.0
    _rt = mulaw_expand_host(
        mulaw_compress_host(np.concatenate([w for w in wavs_out[0][:n_chk]]))
    ).astype(np.float64) / 32768.0
    mulaw_requant_snr = float(
        10 * np.log10(np.mean(_ref**2) / max(np.mean((_ref - _rt) ** 2), 1e-12))
    )

    # reference CPU path on the same magnitudes (GL dominates): median of
    # n_passes single-utterance reps — the baseline jitters with host load
    # as much as the TPU side does with tunnel load
    mag_amp = np.power(10.0, (np.clip(feats[0], 0, 1) * acfg.max_db - acfg.max_db + acfg.ref_db) * 0.05)
    ref_times = []
    for p in range(n_passes):
        t0 = time.perf_counter()
        _numpy_reference_gl(mag_amp**acfg.gl_power, acfg, gl_iters)
        ref_times.append(time.perf_counter() - t0)
        print(f"baseline pass {p}: {1.0 / ref_times[-1]:.3f} utt/s", file=sys.stderr)
    ref_utt_per_sec = 1.0 / float(np.median(ref_times))

    # secondary metric: flagship-size training throughput via the
    # device-resident multi-step path (skipped in --quick to bound runtime)
    train_sps = None
    if not quick:
        import os
        import sys as _sys
        import tempfile

        h5p = None
        try:
            import h5py

            from zerospeech_tts_tpu.data.device_dataset import DeviceDataset
            from zerospeech_tts_tpu.train import Solver

            fd, h5p = tempfile.mkstemp(suffix=".h5")
            os.close(fd)
            with h5py.File(h5p, "w") as f:
                sp = {}
                for i in range(8):
                    spk = f"S{i:02d}"
                    sp[spk] = i
                    x = rng.uniform(0, 1, (500, hps.n_feat)).astype(np.float32)
                    f.create_dataset(f"train/{spk}/{spk}_0/lin", data=x)
                f.attrs["speakers"] = json.dumps(sp)
            ds = DeviceDataset.from_h5(h5p, hps.replace(n_speakers=8), stats=False)
            sol = Solver(hps.replace(n_speakers=8))
            st = sol.init_state(jax.random.PRNGKey(0))
            st, m = sol.train_many(st, ds, "train", 25)  # compile
            _ = float(m["loss_rec"])
            t0 = time.perf_counter()
            st, m = sol.train_many(st, ds, "train", 25)
            _ = float(m["loss_rec"])
            train_sps = round(25 / (time.perf_counter() - t0), 1)
        except Exception as e:  # keep the headline metric alive, but say why
            print(f"train-throughput bench failed: {e!r}", file=_sys.stderr)
            train_sps = None
        finally:
            if h5p and os.path.exists(h5p):
                os.unlink(h5p)

    print(
        json.dumps(
            {
                "metric": "corpus_conversion_throughput",
                "value": round(utt_per_sec, 4),
                "unit": "utterances/sec/chip (PCM in: frontend+encode+convert+GriffinLim-100, 6.4s utts)",
                "vs_baseline": round(utt_per_sec / ref_utt_per_sec, 2),
                "baseline": round(ref_utt_per_sec, 4),
                "baseline_desc": "reference CPU numpy Griffin-Lim path (vocoder only, lower bound on ref cost)",
                "rtf": round(rtf, 2),
                "train_steps_per_sec": train_sps,
                "platform": platform,
                "n_utts": n_utts,
                "gl_iters": gl_iters,
                "n_passes_median": n_passes,
                "passes_utt_per_sec": [round(n_utts / t, 2) for t in times],
                "config": "fused PCM-in program: mu-law 8-bit PCM wire + on-device f32 frontend + bf16 compute",
                "units_agreement_vs_f32": round(units_agreement, 4),
                "mulaw_requantization_snr_db": round(mulaw_requant_snr, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
