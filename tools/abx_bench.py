#!/usr/bin/env python
"""ABX runtime benchmark at real item-file scale (VERDICT r3 ask 5).

The ZR19 English evaluation runs ABX over tens of thousands of phone
items. This tool synthesizes an item set at that scale, times
``eval.abx_discriminability`` with and without the per-cell triple cap,
and records the result to docs/abx_scale_bench.json so the measured
seconds at ~1e4 items are an artifact, not a claim.

Item geometry mirrors a phone-item file: many classes x speakers, small
pools, 4-12 latent-frame snippets, MBV bit vectors.

    python tools/abx_bench.py [--items 10000] [--dim 64] [--cap 200]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))  # runnable as `python tools/abx_bench.py`

from zerospeech_tts_tpu import eval as ev  # noqa: E402


def make_items(n_items: int, dim: int, n_classes: int, n_speakers: int, seed: int = 0):
    """Class-dependent Bernoulli templates + per-item noise so scores are
    not degenerate (ABX lands mid-range, ties occur)."""
    rng = np.random.default_rng(seed)
    templates = rng.integers(0, 2, (n_classes, dim))
    items = []
    per_pool = max(1, n_items // (n_classes * n_speakers))
    for c in range(n_classes):
        for s in range(n_speakers):
            for _ in range(per_pool):
                t = int(rng.integers(4, 13))
                u = np.repeat(templates[c][None], t, axis=0)
                flip = rng.random((t, dim)) < 0.35  # 0.15 scored a degenerate 1.0
                items.append({
                    "cls": f"c{c:02d}", "spk": f"s{s:02d}",
                    "units": np.where(flip, 1 - u, u).astype(np.int8),
                })
    return items


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=10_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--classes", type=int, default=20)
    ap.add_argument("--speakers", type=int, default=10)
    ap.add_argument("--cap", type=int, default=200)
    ap.add_argument("--across", action="store_true")
    ap.add_argument("--exact-subset", type=int, default=1_000,
                    help="also time the EXACT (uncapped) path on this many "
                         "items (uncapped at 1e4 items is the hours-scale "
                         "regime the cap exists to avoid)")
    ap.add_argument("-o", "--out", default=str(REPO / "docs" / "abx_scale_bench.json"))
    args = ap.parse_args()

    items = make_items(args.items, args.dim, args.classes, args.speakers)
    print(f"{len(items)} items, dim {args.dim}, "
          f"{args.classes} classes x {args.speakers} speakers")

    t0 = time.perf_counter()
    rep = ev.abx_discriminability(
        items, across_speaker=args.across, max_triples_per_cell=args.cap)
    capped_s = time.perf_counter() - t0
    print(f"capped (cap={args.cap}): {capped_s:.1f} s  ->  {rep}")

    sub = items[: args.exact_subset]
    t0 = time.perf_counter()
    rep_sub = ev.abx_discriminability(sub, across_speaker=args.across)
    exact_sub_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    rep_sub_cap = ev.abx_discriminability(
        sub, across_speaker=args.across, max_triples_per_cell=args.cap)
    capped_sub_s = time.perf_counter() - t0
    print(f"subset {len(sub)} items exact: {exact_sub_s:.1f} s ({rep_sub['abx']}), "
          f"capped: {capped_sub_s:.1f} s ({rep_sub_cap['abx']})")

    out = {
        "n_items": len(items),
        "dim": args.dim,
        "n_classes": args.classes,
        "n_speakers": args.speakers,
        "mode": rep["mode"],
        "cap": args.cap,
        "capped_seconds": round(capped_s, 2),
        "capped_report": rep,
        "exact_subset_items": len(sub),
        "exact_subset_seconds": round(exact_sub_s, 2),
        "capped_subset_seconds": round(capped_sub_s, 2),
        "subset_abx_exact": rep_sub["abx"],
        "subset_abx_capped": rep_sub_cap["abx"],
        "subset_cap_abs_error": round(abs(rep_sub["abx"] - rep_sub_cap["abx"]), 4),
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
