#!/usr/bin/env python
"""Pair-objective sweep: run the convergence demo across a lambda_pair
grid and compose docs/pair_objective_ab.json — a leakage-vs-conversion
TRADE-OFF CURVE, not just the on/off endpoints (VERDICT r4 weak #4: a
single binary A/B measured lambda_pair 0.1 halving target-envelope
accuracy for its leakage win; whether 0.1 is the right default needs the
curve between).

The pair objective is the reference dataloader's stage-1 contract (SURVEY
§2 "Data loader", grade H on the pair's existence): two windows of the
same utterance must map to consistent units. On the round-3 tonal corpus
every discriminative metric saturated; the round-4 corpus (confusable
content classes, overlapping formant speakers — examples/convergence_demo
make_corpus) leaves ABX and unit stability with dynamic range, so the
sweep is actually informative.

Usage:
    python tools/pair_ab.py [--iters 600] [--sweep 0,0.02,0.05,0.1,0.2]
                            [--out docs/pair_objective_ab.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

FIELDS = [
    "convergence_gate",
    "loss_rec_after_ae",
    "loss_rec_final",
    "clf_acc_after_pretrain",
    "clf_acc_final",
    "units_active_fraction",
    "unit_stability",
    "abx",
    "abx_initial",
    "abx_delta",
    "target_envelope_accuracy",
]


def run_demo(iters: int, lambda_pair: float | None, tag: str) -> dict:
    report = Path(tempfile.mkdtemp(prefix=f"zs_pair_ab_{tag}_")) / "report.json"
    cmd = [
        sys.executable,
        str(REPO / "examples" / "convergence_demo.py"),
        "--iters",
        str(iters),
        "--report",
        str(report),
    ]
    if lambda_pair is not None:
        cmd += ["--lambda-pair", str(lambda_pair)]
    print(f"== {tag}: {' '.join(cmd)}", flush=True)
    # exit 1 = the demo's convergence gate judged the run WEAK. For a sweep
    # that is a RESULT (e.g. lambda_pair=0 fails the speaker-leakage gate),
    # not a tool failure — record it, don't crash.
    proc = subprocess.run(cmd, cwd=REPO)
    if not report.exists():
        raise RuntimeError(f"{tag}: demo produced no report (rc={proc.returncode})")
    out = json.loads(report.read_text())
    out["convergence_gate"] = "PASS" if proc.returncode == 0 else "WEAK"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--sweep", default="0,0.02,0.05,0.1,0.2",
                    help="comma-separated lambda_pair values, one demo run each")
    ap.add_argument("--out", default=str(REPO / "docs" / "pair_objective_ab.json"))
    args = ap.parse_args()

    lams = [float(v) for v in args.sweep.split(",")]
    t0 = time.time()
    points = {}
    for lam in lams:
        tag = f"lp{lam:g}".replace(".", "p")
        rep = run_demo(args.iters, lam, tag)
        points[f"{lam:g}"] = {k: rep[k] for k in FIELDS if k in rep}
        print(f"== lambda_pair={lam:g}: "
              f"leak={rep.get('clf_acc_final')} abx={rep.get('abx')} "
              f"tgt_acc={rep.get('target_envelope_accuracy')} "
              f"stability={rep.get('unit_stability')}", flush=True)

    chance = 1.0 / 6.0  # demo corpus: 6 speakers
    # default selection rule, applied to the recorded curve: among points
    # whose final leakage stays under 1.5x chance (the demo's own
    # adversarial-phase gate), prefer the highest conversion quality
    # (target_envelope_accuracy, then ABX). Leakage containment is the
    # pair objective's JOB (ref stage-1 contract), so it is a constraint,
    # not a term to trade linearly against accuracy.
    ok_pts = {
        k: v for k, v in points.items()
        if isinstance(v.get("clf_acc_final"), (int, float))
        and v["clf_acc_final"] <= 1.5 * chance
    }
    pool = ok_pts or points
    best = max(
        pool.items(),
        key=lambda kv: (
            kv[1].get("target_envelope_accuracy") or 0.0,
            kv[1].get("abx") or 0.0,
        ),
    )[0]

    # the r4-compat on/off endpoint framing is ONLY emitted when the sweep
    # actually contains the 0.1 default and the 0 baseline — substituting
    # another point under these field names would mislabel the artifact
    on = points.get("0.1")
    off = points.get("0")
    doc = {
        "what": (
            "convergence-demo sweep of the stage-1 same-utterance pair "
            f"objective weight lambda_pair in {{{args.sweep}}}, {args.iters} "
            "iters each, 6 multi-formant speakers x 9 confusable content "
            "classes (examples/convergence_demo.py make_corpus)"
        ),
        "sweep": points,
        "leakage_constraint": f"clf_acc_final <= 1.5/6 = {1.5 * chance:.4f}",
        "recommended_lambda_pair": float(best),
        "recommendation_rule": (
            "max target_envelope_accuracy (tie: ABX) among points meeting "
            "the leakage constraint; falls back to all points if none meet it"
        ),
        "wall_seconds": round(time.time() - t0, 1),
    }
    if off is not None and on is not None:
        # keep the r4 on/off endpoint framing for comparability
        doc["pair_on"] = on
        doc["pair_off"] = off
        doc["deltas_on_minus_off"] = {
            k: round(float(on[k]) - float(off[k]), 4)
            for k in FIELDS
            if isinstance(on.get(k), (int, float)) and isinstance(off.get(k), (int, float))
        }
    Path(args.out).write_text(json.dumps(doc, indent=2) + "\n")
    print(json.dumps(doc, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
