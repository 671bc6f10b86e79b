"""Serving-path latency / throughput benchmark (serve.py surface).

Quantifies what the serving docs claim qualitatively: request latency
through the warm micro-batching service (ref has no serving mode — this
is the TPU rebuild's production surface over the ref --test_single
conversion stack, SURVEY §3.4):

- SOLO latency: one client, sequential requests -> p50/p95 per request
  (full conversion and units-only), on a warmed bucket so no request
  pays an XLA compile.
- CONCURRENT throughput: K threads x M back-to-back requests sharing
  the service -> aggregate req/s, per-request p50/p95, and the
  micro-batching ratio (requests per program dispatch) actually
  achieved.

Every request uses a distinct tone (the tunnel short-circuits repeated
identical calls on identical buffers — recorded environment note), and
latency is measured around the blocking convert() call, so queueing +
batching window + dispatch + readback are all inside the number.

Usage:
    python tools/serve_bench.py                  # flagship model, TPU
    python tools/serve_bench.py --platform cpu --quick   # tiny, CPU

Prints one JSON line; append it to docs/serve_latency.json by hand (or
redirect) when recording an artifact.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["tpu", "cpu"])
    ap.add_argument("--quick", action="store_true", help="tiny model, few reqs")
    ap.add_argument("--gl-iters", type=int, default=None)
    ap.add_argument("--bucket", type=int, default=None, help="utterance bucket (frames)")
    ap.add_argument("--n-solo", type=int, default=None)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--reqs-per-client", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/zstts_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from zerospeech_tts_tpu.config import AudioConfig, Hps
    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.models import Decoder, Encoder
    from zerospeech_tts_tpu.serve import ConversionService

    if args.quick:
        hps = Hps().replace(
            speaker_norm=False, n_feat=129, emb_size=32, spk_emb_size=8,
            n_speakers=2, seg_len=32, bank_size=4, bank_channels=8,
            conv_channels=16,
        )
        acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20,
                           gl_iters=args.gl_iters or 2)
        bucket = args.bucket or 64
        n_solo = args.n_solo or 4
        reqs_per_client = args.reqs_per_client or 3
    else:
        hps = Hps()
        acfg = AudioConfig(gl_iters=args.gl_iters or AudioConfig().gl_iters)
        bucket = args.bucket or 256  # ~3.2 s utterances
        n_solo = args.n_solo or 10
        reqs_per_client = args.reqs_per_client or 5

    platform = jax.devices()[0].platform
    k = jax.random.PRNGKey(0)
    enc, dec = Encoder(hps), Decoder(hps)
    enc_params = enc.init(k, np.zeros((1, hps.seg_len, hps.n_feat), np.float32))
    dec_params = dec.init(
        k, np.zeros((1, hps.n_bins, hps.emb_size), np.float32), np.zeros((1,), np.int32)
    )
    conv = Converter(
        hps, acfg, enc_params, dec_params,
        gl_iters=acfg.gl_iters, batch_size=8, bucket_frames=bucket,
        compute_dtype="float32" if platform == "cpu" else "bfloat16",
        pcm_wire="int16" if platform == "cpu" else "mulaw",  # deployment wire
    )
    svc = ConversionService(conv, {"V000": 0}, window_ms=5.0)

    sr = acfg.sr
    n_samp = bucket * acfg.hop_length - 1  # exactly one bucket after trim=False

    def tone(i: int) -> np.ndarray:
        t = np.arange(n_samp) / sr
        return (0.4 * np.sin(2 * np.pi * (150 + 7 * i) * t)).astype(np.float32)

    t_warm = svc.warmup([bucket])
    print(f"warmup({bucket}) took {t_warm:.1f}s", file=sys.stderr)

    # ---- solo latency (sequential, warm) --------------------------------
    lat_full, lat_units = [], []
    for i in range(n_solo):
        t0 = time.perf_counter()
        svc.convert(tone(i), ("V000",), trim=False)
        lat_full.append(time.perf_counter() - t0)
    for i in range(n_solo):
        t0 = time.perf_counter()
        svc.convert(tone(100 + i), (), trim=False)  # units-only
        lat_units.append(time.perf_counter() - t0)

    # ---- concurrent throughput ------------------------------------------
    K, M = args.clients, reqs_per_client
    lat_conc: list[float] = []
    lock = threading.Lock()
    d0, s0 = svc.dispatches, svc.served

    def client(cid: int) -> None:
        for j in range(M):
            t0 = time.perf_counter()
            svc.convert(tone(1000 + cid * M + j), ("V000",), trim=False)
            dt = time.perf_counter() - t0
            with lock:
                lat_conc.append(dt)

    threads = [threading.Thread(target=client, args=(c,)) for c in range(K)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    n_disp = svc.dispatches - d0
    n_served = svc.served - s0
    svc.close()

    def pct(xs, q):
        return round(float(np.percentile(np.asarray(xs) * 1000.0, q)), 1)

    print(
        json.dumps(
            {
                "metric": "serve_latency",
                "platform": platform,
                "model": "tiny" if args.quick else "flagship",
                "bucket_frames": bucket,
                "utt_seconds": round(n_samp / sr, 2),
                "gl_iters": acfg.gl_iters,
                "solo_p50_ms": pct(lat_full, 50),
                "solo_p95_ms": pct(lat_full, 95),
                "units_only_p50_ms": pct(lat_units, 50),
                "units_only_p95_ms": pct(lat_units, 95),
                "concurrent_clients": K,
                "reqs_per_client": M,
                "concurrent_req_per_sec": round(K * M / wall, 2),
                "concurrent_p50_ms": pct(lat_conc, 50),
                "concurrent_p95_ms": pct(lat_conc, 95),
                "microbatch_requests_per_dispatch": round(n_served / max(n_disp, 1), 2),
                "window_ms": 5.0,
            }
        )
    )


if __name__ == "__main__":
    main()
