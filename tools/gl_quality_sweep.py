#!/usr/bin/env python
"""Quality-vs-iterations sweep for Griffin-Lim: find the smallest iteration
count at which momentum-GL (cfg.gl_momentum=0.99, the default) reaches the
magnitude-consistency of the reference's plain GL-100 on every probe signal.

The reference runs plain Griffin-Lim for ~100 iterations
(ref utils.py:~80-180 spectrogram2wav, SURVEY §2 Audio DSP row). Fast GL
(Perraudin et al. 2013) converges markedly faster at identical per-iteration
cost, so a quality-matched lower iteration count is a *free* vocoder FLOP
cut — the vocoder carries ~93% of the conversion program's FLOPs.

Writes docs/gl_quality_vs_iters.json:
  - per-signal consistency error for each (iters, momentum) pair
  - `matched_iters`: the smallest swept iters where momentum-GL error <=
    plain GL-100 error on EVERY signal (the honest "same quality as the
    reference default" operating point; bench.py records a device-resident
    arm at this count)

Run on CPU (metric is platform-independent):
    JAX_PLATFORMS=cpu python tools/gl_quality_sweep.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"].split(",")[0])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from zerospeech_tts_tpu.config import AudioConfig  # noqa: E402
from zerospeech_tts_tpu.dsp import audio as A  # noqa: E402


def make_signals(sr: int, n: int) -> dict[str, np.ndarray]:
    t = np.arange(n) / sr
    rng = np.random.default_rng(7)
    tone_stack = sum(0.2 * np.sin(2 * np.pi * f * t) for f in (220, 440, 880, 1760))
    am_tone = (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)) * 0.5 * np.sin(2 * np.pi * 500 * t)
    noise = rng.standard_normal(n) * 0.2
    burst = noise * (np.sin(2 * np.pi * 2 * t) > 0)
    chirp = 0.5 * np.sin(2 * np.pi * (200 * t + 1900 * t**2 / (2 * t[-1])))
    return {
        "tone_stack": tone_stack.astype(np.float32),
        "am_tone": am_tone.astype(np.float32),
        "noise_burst": burst.astype(np.float32),
        "chirp": chirp.astype(np.float32),
    }


def consistency_error(mag: jnp.ndarray, out: np.ndarray, cfg: AudioConfig) -> float:
    r2, i2 = A.stft(jnp.asarray(out), cfg, method="fused")
    m2 = np.sqrt(np.asarray(r2) ** 2 + np.asarray(i2) ** 2)
    m = np.asarray(mag)
    return float(np.linalg.norm(m2[4:-4] - m[4:-4]) / np.linalg.norm(m[4:-4]))


def main() -> None:
    cfg0 = AudioConfig()
    sweep_iters = [16, 24, 32, 48, 64, 100]
    momenta = [0.0, cfg0.gl_momentum]
    signals = make_signals(cfg0.sr, 102_400)  # 6.4 s, matches the bench shape

    results: dict[str, dict[str, dict[str, float]]] = {}
    mags = {}
    for name, y in signals.items():
        re, im = A.stft(jnp.asarray(y), cfg0, method="fused")
        mags[name] = jnp.sqrt(re**2 + im**2)

    for alpha in momenta:
        cfg = dataclasses.replace(cfg0, gl_momentum=alpha)
        for it in sweep_iters:
            for name, mag in mags.items():
                out = np.asarray(A.griffin_lim(mag, cfg, n_iters=it))
                err = consistency_error(mag, out, cfg0)
                results.setdefault(name, {}).setdefault(str(alpha), {})[str(it)] = round(err, 5)
                print(f"{name:12s} momentum={alpha:4} iters={it:3d} err={err:.5f}",
                      file=sys.stderr)

    # reference operating point: plain GL at cfg.gl_iters (=100)
    ref_errs = {name: results[name]["0.0"][str(cfg0.gl_iters)] for name in signals}
    ref_geomean = float(np.exp(np.mean([np.log(v) for v in ref_errs.values()])))

    # two match criteria, strictest first:
    #  - strict: momentum-GL error <= plain-GL-100 on EVERY signal
    #  - geomean: geometric-mean error over the signal set <= plain-GL-100's
    #    (the aggregate a corpus sees; individual signals may trade)
    matched = None
    matched_geomean = None
    geomeans = {}
    worst_ratio = {}
    for it in sweep_iters:
        errs = {n: results[n][str(cfg0.gl_momentum)][str(it)] for n in signals}
        geomeans[str(it)] = round(float(np.exp(np.mean([np.log(v) for v in errs.values()]))), 5)
        worst_ratio[str(it)] = round(max(errs[n] / ref_errs[n] for n in signals), 3)
        if matched is None and all(errs[n] <= ref_errs[n] for n in signals):
            matched = it
        if matched_geomean is None and geomeans[str(it)] <= ref_geomean:
            matched_geomean = it

    report = {
        "metric": "relative magnitude-consistency error |stft(gl(mag))|-mag| / |mag| (lower=better)",
        "signal_seconds": 6.4,
        "sweep_iters": sweep_iters,
        "momenta": momenta,
        "reference_point": {
            "momentum": 0.0,
            "iters": cfg0.gl_iters,
            "errors": ref_errs,
            "geomean": round(ref_geomean, 5),
        },
        "per_signal": results,
        "momentum_geomean_by_iters": geomeans,
        "momentum_worst_signal_ratio_vs_ref": worst_ratio,
        "matched_iters_strict": matched,
        "matched_iters_geomean": matched_geomean,
        "conclusion": (
            f"strict per-signal dominance over plain GL-{cfg0.gl_iters} needs "
            f"{matched} momentum-GL iterations (pure tones converge fast under "
            f"plain GL, so the tone probe binds); on the geometric mean over the "
            f"signal set, momentum-GL matches at {matched_geomean} iterations "
            f"(worst single-signal ratio {worst_ratio.get(str(matched_geomean))}x), "
            f"a {cfg0.gl_iters / matched_geomean:.1f}x vocoder FLOP cut at "
            "aggregate reference-or-better quality — recorded as the bench's "
            "reduced-iteration arm, never the headline."
            if matched_geomean
            else "no swept iteration count matches plain GL-100 on the geomean"
        ),
    }
    out_path = REPO / "docs" / "gl_quality_vs_iters.json"
    out_path.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps({"matched_iters": matched, "reference_errors": ref_errs}))


if __name__ == "__main__":
    main()
