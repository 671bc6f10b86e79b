"""Preprocess / corpus-build throughput artifact (SURVEY.md §3.1: the
reference's `--preprocess` is a serial CPU librosa loop that runs for
hours over the challenge corpus — "embarrassingly parallel over
utterances" and the stage BASELINE.json targets with fused kernels).

Times the REAL `build_corpus` stack (native C++ wav decode + trim in a
producer thread, jitted/Pallas frontend, deferred readback, h5 + stats
writes) against a reference-equivalent numpy loop (same decode/trim, then
preemphasis -> framed rfft STFT -> Slaney mel -> dB -> [0,1] normalize in
numpy, with the same h5 + per-speaker-stats writes), and records feature
parity between the two.

Writes docs/preprocess_bench.json and prints the same JSON line.
Run:  python tools/preprocess_bench.py [--quick] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def numpy_reference_features(y: np.ndarray, cfg) -> tuple[np.ndarray, np.ndarray]:
    """The reference get_spectrograms math (ref preprocess.py:~20-80) in
    plain numpy: preemphasis 0.97, centered STFT (reflect pad, Hann window
    zero-padded into n_fft), |mag|, Slaney mel, 20*log10 dB, [0,1] norm."""
    from zerospeech_tts_tpu.dsp.mel import mel_filterbank

    yp = np.concatenate([y[:1], y[1:] - cfg.preemphasis * y[:-1]]).astype(np.float64)
    n_fft, hop = cfg.n_fft, cfg.hop_length
    n = np.arange(cfg.win_length)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * n / cfg.win_length)
    win = np.zeros(n_fft, np.float64)
    lpad = (n_fft - cfg.win_length) // 2
    win[lpad : lpad + cfg.win_length] = w

    pad = n_fft // 2
    ypad = np.pad(yp, (pad, pad), mode="reflect")
    t = 1 + len(yp) // hop
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = ypad[idx] * win
    mag = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1))
    mel_basis = mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, dtype=np.float64)
    mel = mag @ mel_basis.T

    def db_norm(a):
        db = 20.0 * np.log10(np.maximum(1e-5, a))
        return np.clip((db - cfg.ref_db + cfg.max_db) / cfg.max_db, 1e-8, 1.0)

    return db_norm(mel).astype(np.float32), db_norm(mag).astype(np.float32)


def build_reference(wav_dir: Path, out_h5: Path, cfg) -> None:
    """Reference-equivalent corpus build: serial decode -> numpy features
    -> h5 + per-speaker stats (the same artifact set build_corpus writes)."""
    import h5py

    from zerospeech_tts_tpu.data.corpus import _SpeakerStats, discover_wavs, speaker_of
    from zerospeech_tts_tpu.dsp import load_wav, trim_silence

    speakers: dict[str, int] = {}
    stats: dict[str, dict[str, _SpeakerStats]] = {"mel": {}, "lin": {}}
    with h5py.File(out_h5, "w") as f:
        for split, paths in discover_wavs(wav_dir).items():
            for path in paths:
                y = trim_silence(load_wav(path, cfg.sr), cfg.top_db)
                spk = speaker_of(path)
                speakers.setdefault(spk, len(speakers))
                mel, lin = numpy_reference_features(y, cfg)
                grp = f.require_group(f"{split}/{spk}/{path.stem}")
                grp.create_dataset("mel", data=mel, dtype=np.float32)
                grp.create_dataset("lin", data=lin, dtype=np.float32)
                if split == "train":
                    for name, feats in (("mel", mel), ("lin", lin)):
                        stats[name].setdefault(spk, _SpeakerStats()).update(feats)
        for name in ("mel", "lin"):
            for spk, st in stats[name].items():
                mean, std = st.finalize()
                g = f.require_group(f"stats/{spk}")
                g.create_dataset(f"{name}_mean", data=mean)
                g.create_dataset(f"{name}_std", data=std)
        f.attrs["speakers"] = json.dumps(speakers)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="8 utts, 1 timed pass")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=str(REPO / "docs" / "preprocess_bench.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/zstts_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.data import build_corpus
    from zerospeech_tts_tpu.dsp import save_wav

    cfg = AudioConfig()
    n_utts = 8 if args.quick else 64
    n_passes = 1 if args.quick else 3

    # synthetic ZR19-layout corpus: 4 speakers, 2-6 s utterances. Harmonic
    # tones + noise exercise the same code paths as speech (decode, trim,
    # STFT, mel) at the same cost — the frontend is content-oblivious.
    rng = np.random.default_rng(0)
    work = Path(tempfile.mkdtemp(prefix="zstts_prep_bench_"))
    corpus = work / "corpus"
    audio_s = 0.0
    for i in range(n_utts):
        spk = f"S{i % 4:02d}"
        secs = float(rng.uniform(2.0, 6.0))
        audio_s += secs
        t = np.arange(int(secs * cfg.sr)) / cfg.sr
        f0 = 120 + 10 * i
        y = (
            0.4 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 2.7 * f0 * t)
            + 0.01 * rng.standard_normal(len(t))
        ).astype(np.float32)
        save_wav(corpus / "train" / "unit" / f"{spk}_{i:04d}.wav", y, cfg.sr)

    # --- the real stack (native decode thread + jitted frontend + h5) ----
    times = []
    for p in range(n_passes + 1):  # pass 0 warms the bucket-program compiles
        t0 = time.perf_counter()
        build_corpus(corpus, work / f"ds_{p}.h5", cfg)
        dt = time.perf_counter() - t0
        os.unlink(work / f"ds_{p}.h5")
        if p > 0:
            times.append(dt)
        print(
            f"build_corpus pass {p}: {n_utts / dt:.2f} utt/s"
            + (" (compile warmup)" if p == 0 else ""),
            file=sys.stderr,
        )
    dt = float(np.median(times)) if times else dt
    # --- the reference-equivalent numpy loop -----------------------------
    ref_times = []
    for p in range(n_passes):
        t0 = time.perf_counter()
        build_reference(corpus, work / "ref.h5", cfg)
        ref_times.append(time.perf_counter() - t0)
        os.unlink(work / "ref.h5")
        print(f"numpy reference pass {p}: {n_utts / ref_times[-1]:.2f} utt/s", file=sys.stderr)
    ref_dt = float(np.median(ref_times))

    # --- parity: both paths agree in the normalized-dB feature domain ----
    from zerospeech_tts_tpu.dsp import audio as dsp_audio
    from zerospeech_tts_tpu.dsp import load_wav, trim_silence

    wavs = sorted((corpus / "train" / "unit").glob("*.wav"))[:2]
    max_diff = 0.0
    for p in wavs:
        y = trim_silence(load_wav(p, cfg.sr), cfg.top_db)
        mel_j, lin_j = dsp_audio.get_spectrograms(y, cfg)
        mel_n, lin_n = numpy_reference_features(y, cfg)
        max_diff = max(
            max_diff,
            float(np.abs(mel_j - mel_n).max()),
            float(np.abs(lin_j - lin_n).max()),
        )

    report = {
        "metric": "corpus_build_throughput",
        "preprocess_utts_per_sec": round(n_utts / dt, 2),
        "preprocess_audio_seconds_per_sec": round(audio_s / dt, 1),
        "baseline_utts_per_sec": round(n_utts / ref_dt, 2),
        "speedup_vs_numpy_reference": round(ref_dt / dt, 2),
        "max_abs_feature_diff_dbnorm": round(max_diff, 6),
        "n_utts": n_utts,
        "audio_seconds": round(audio_s, 1),
        "n_passes_median": n_passes,
        "platform": jax.devices()[0].platform,
        "native_decoder": _native_available(),
        "note": (
            "features return f32 over the host wire (~1 MB/utt); on this "
            "tunneled host the build is wire/host-bound — on local-PCIe "
            "hardware the frontend kernel time (~8 ms/2048 frames) bounds it"
        ),
    }
    if not args.quick:
        Path(args.out).write_text(json.dumps(report, indent=1) + "\n")
    print(json.dumps(report))


def _native_available() -> bool:
    from zerospeech_tts_tpu.data import native as native_io

    return bool(getattr(native_io, "available", lambda: False)())


if __name__ == "__main__":
    main()
