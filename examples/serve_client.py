"""Minimal client for the ``zstts serve`` HTTP conversion service.

Stdlib only — mirrors what any deployment client does: POST a wav, get
back the challenge-format discrete units and one PCM16 wav per target.

    # terminal 1
    zstts serve -dataset_path ds.h5 -ckpt_dir ckpt --port 8571

    # terminal 2
    python examples/serve_client.py --url http://127.0.0.1:8571 \
        --wav input.wav --targets V001,V002 --out-dir converted/

Exercised end-to-end (service + HTTP layer) by tests/test_serve.py.
"""

from __future__ import annotations

import argparse
import base64
import json
import sys
import urllib.error
import urllib.request
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--url", default="http://127.0.0.1:8571")
    ap.add_argument("--wav", required=True, help="input wav file")
    ap.add_argument("--targets", default=None,
                    help="comma-separated target speakers (omit for units-only)")
    ap.add_argument("--out-dir", default="converted")
    ap.add_argument("--no-trim", action="store_true")
    ap.add_argument("--timeout", type=float, default=900.0,
                    help="first request per utterance length pays an XLA compile")
    args = ap.parse_args()

    with urllib.request.urlopen(f"{args.url}/healthz", timeout=30) as r:
        print("server:", r.read().decode())

    wav_bytes = Path(args.wav).read_bytes()
    trim = "0" if args.no_trim else "1"
    if args.targets:
        path = f"/convert?targets={args.targets}&trim={trim}"
    else:
        path = f"/units?trim={trim}"
    req = urllib.request.Request(args.url + path, data=wav_bytes, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=args.timeout) as r:
            out = json.loads(r.read())
    except urllib.error.HTTPError as e:
        body = e.read()
        try:  # the server sends JSON, but a proxy's 502 page may not be
            detail = json.loads(body).get("error")
        except (ValueError, AttributeError):
            detail = body[:200].decode(errors="replace")
        sys.exit(f"HTTP {e.code}: {detail}")

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(args.wav).stem
    units_path = out_dir / f"{stem}.txt"
    units_path.write_text(out["units"] + "\n")
    n_frames = len(out["units"].splitlines())
    print(f"units: {n_frames} latent frames -> {units_path}")
    for tgt, b64wav in out.get("wavs", {}).items():
        wav_path = out_dir / tgt / f"{stem}.wav"
        wav_path.parent.mkdir(parents=True, exist_ok=True)
        wav_path.write_bytes(base64.b64decode(b64wav))
        print(f"converted ({tgt}) -> {wav_path}")


if __name__ == "__main__":
    main()
