#!/usr/bin/env python
"""Corpus-level evidence for the quality-matched GL-48 vocoder arm
(VERDICT r4 weak #9: momentum-GL-48 == plain-GL-100 was claimed on 4
synthetic probe signals only — "do not promote the arm without
corpus-level evidence").

This tool measures the same A/B on MODEL-DECODED magnitudes: it fits a
quick stage-1 autoencoder on the convergence-demo corpus, decodes every
held-out utterance to both target voices (the spectra a deployment
actually vocodes — decoder-smoothed, denormalized, clipped), then runs
plain GL-100 (the reference operating point) and momentum-GL-48 (the
bench's reduced-iteration arm) on each magnitude and compares:

  - magnitude-consistency error |stft(gl(mag))| - mag| / |mag| on the
    GL target (amp**gl_power), the metric GL itself minimizes;
  - normalized-feature L1: |features(wav) - intended features|, the
    corpus-level "mel-L1 of converted outputs" probe.

Reports per-utterance ratios (GL48/GL100), their geomean/worst, and the
fraction of utterances where GL-48 is at-or-better. Writes
docs/gl_corpus_ab.json.

    python tools/gl_corpus_ab.py [--iters 400] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=400, help="pretrain_AE iters")
    ap.add_argument("--gl-fast-iters", type=int, default=48)
    ap.add_argument("-o", "--out", default=str(REPO / "docs" / "gl_corpus_ab.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/zstts_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    sys.path.insert(0, str(REPO / "examples"))
    from convergence_demo import make_corpus  # noqa: E402

    from zerospeech_tts_tpu.config import AudioConfig, Hps
    from zerospeech_tts_tpu.data import build_corpus
    from zerospeech_tts_tpu.data.device_dataset import DeviceDataset
    from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats
    from zerospeech_tts_tpu.dsp import audio as A
    from zerospeech_tts_tpu.models import unit_bits
    from zerospeech_tts_tpu.train import Solver

    t_start = time.time()
    cfg = AudioConfig()
    work = Path(tempfile.mkdtemp(prefix="zs_glab_"))
    make_corpus(work / "corpus")
    hps = Hps(
        batch_size=32, seg_len=64, n_feat=513, emb_size=128, spk_emb_size=32,
        n_speakers=6, bank_size=8, bank_channels=64, conv_channels=256, lr=4e-4,
    )
    manifest = build_corpus(work / "corpus", work / "ds.h5", cfg)
    stats = SpeakerStats.load(work / "ds.h5", "lin") if hps.speaker_norm else None
    ds = DeviceDataset.from_h5(work / "ds.h5", hps, target_speakers=["V001", "V002"])
    sol = Solver(hps)
    state = sol.init_state(jax.random.PRNGKey(0))
    state, m = sol.train_many(state, ds, "pretrain_AE", args.iters)
    print(f"== AE fit: {args.iters} iters, loss_rec={float(m['loss_rec']):.3f}",
          file=sys.stderr)

    import h5py

    feats, src_spks = [], []
    with h5py.File(work / "ds.h5", "r") as f:
        for spk in f["test"]:
            for utt in f["test"][spk]:
                feats.append(f[f"test/{spk}/{utt}/lin"][:])
                src_spks.append(spk)
    # one common length -> one decode/GL program shape (snap to the
    # downsample grid); truncation is irrelevant to vocoder quality.
    # Encoder inputs must be source-speaker z-normalized, exactly as in
    # training/conversion.
    t_common = (min(x.shape[0] for x in feats) // hps.downsample) * hps.downsample
    x = np.stack([
        (stats.normalize(f[:t_common], s) if stats is not None else f[:t_common])
        for f, s in zip(feats, src_spks)
    ]).astype(np.float32)

    @jax.jit
    def decode_mags(enc_p, dec_p, xb, spk_id, t_mean, t_std):
        logits = sol.encoder.apply(enc_p, xb)
        z = unit_bits(logits, hps.enc_mode).astype(jnp.float32)
        xh = sol.decoder.apply(dec_p, z, jnp.full((xb.shape[0],), spk_id, jnp.int32))
        return jnp.clip(xh * t_std[None, None, :] + t_mean[None, None, :], 0.0, 1.0)

    mags = []
    for tgt in ("V001", "V002"):
        tm, tsd = (stats.get(tgt) if stats is not None
                   else (np.zeros(hps.n_feat, np.float32), np.ones(hps.n_feat, np.float32)))
        mags.append(np.asarray(decode_mags(
            state.enc, state.dec, jnp.asarray(x),
            manifest["speakers"][tgt], jnp.asarray(tm), jnp.asarray(tsd))))
    mags = np.concatenate(mags, axis=0)  # [2*n_utts, T, F] normalized [0,1]
    print(f"== {mags.shape[0]} decoded magnitudes of {t_common} frames", file=sys.stderr)

    cfg_plain = dataclasses.replace(cfg, gl_momentum=0.0)

    def consistency(mag_amp, out):
        r2, i2 = A.stft(jnp.asarray(out), cfg, method="fused")
        m2 = np.sqrt(np.asarray(r2) ** 2 + np.asarray(i2) ** 2)
        m = np.asarray(mag_amp)
        return float(np.linalg.norm(m2[4:-4] - m[4:-4]) / np.linalg.norm(m[4:-4]))

    rows = []
    for i in range(mags.shape[0]):
        mn = jnp.asarray(mags[i])
        amp = np.asarray(A.db_norm_to_amp(mn, cfg)) ** cfg.gl_power
        out100 = np.asarray(A.griffin_lim(jnp.asarray(amp), cfg_plain, n_iters=100))
        out48 = np.asarray(A.griffin_lim(jnp.asarray(amp), cfg, n_iters=args.gl_fast_iters))
        c100, c48 = consistency(amp, out100), consistency(amp, out48)
        # corpus feature-L1: features of the synthesized audio (after the
        # full spectrogram2wav tail incl. de-preemphasis) vs the intended
        # normalized features
        w100 = np.asarray(A.spectrogram2wav(mn, cfg_plain, n_iters=100))
        w48 = np.asarray(A.spectrogram2wav(mn, cfg, n_iters=args.gl_fast_iters))
        _, f100 = A.get_spectrograms(np.clip(w100, -1, 1), cfg)
        _, f48 = A.get_spectrograms(np.clip(w48, -1, 1), cfg)
        tlen = min(f100.shape[0], mags[i].shape[0])
        l100 = float(np.abs(f100[:tlen] - mags[i][:tlen]).mean())
        l48 = float(np.abs(f48[:tlen] - mags[i][:tlen]).mean())
        rows.append({"consistency_gl100": c100, "consistency_gl48": c48,
                     "feat_l1_gl100": l100, "feat_l1_gl48": l48})
        if i % 12 == 0:
            print(f"  utt {i}: cons {c100:.4f} vs {c48:.4f}; L1 {l100:.4f} vs {l48:.4f}",
                  file=sys.stderr)

    c_ratio = [r["consistency_gl48"] / r["consistency_gl100"] for r in rows]
    l_ratio = [r["feat_l1_gl48"] / r["feat_l1_gl100"] for r in rows]
    report = {
        "what": (
            f"plain GL-100 vs momentum-GL-{args.gl_fast_iters} on "
            f"{mags.shape[0]} MODEL-DECODED magnitudes ({t_common} frames each; "
            "held-out utterances x 2 target voices, quick-AE-fit demo corpus)"
        ),
        "n_magnitudes": int(mags.shape[0]),
        "consistency_ratio_gl48_over_gl100": {
            "geomean": round(float(np.exp(np.mean(np.log(c_ratio)))), 4),
            "worst": round(float(np.max(c_ratio)), 4),
            "best": round(float(np.min(c_ratio)), 4),
            "frac_at_or_better": round(float(np.mean(np.array(c_ratio) <= 1.0)), 4),
        },
        "feature_l1_ratio_gl48_over_gl100": {
            "geomean": round(float(np.exp(np.mean(np.log(l_ratio)))), 4),
            "worst": round(float(np.max(l_ratio)), 4),
            "best": round(float(np.min(l_ratio)), 4),
            "frac_at_or_better": round(float(np.mean(np.array(l_ratio) <= 1.0)), 4),
        },
        "mean_consistency_gl100": round(float(np.mean([r["consistency_gl100"] for r in rows])), 4),
        "mean_consistency_gl48": round(float(np.mean([r["consistency_gl48"] for r in rows])), 4),
        "mean_feat_l1_gl100": round(float(np.mean([r["feat_l1_gl100"] for r in rows])), 4),
        "mean_feat_l1_gl48": round(float(np.mean([r["feat_l1_gl48"] for r in rows])), 4),
        "wall_seconds": round(time.time() - t_start, 1),
    }
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
