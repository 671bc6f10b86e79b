#!/usr/bin/env python
"""Per-stage device-resident timing of the flagship stage-1 training step
(VERDICT r4 ask 6: train MFU has sat at ~0.29 since r3 with the
"GRU-latency-bound" argument living in comments — measure it, and either
lift it or record the floor).

Method mirrors tools/profile_stages.py: ISOLATED stage programs — encoder
forward, encoder forward+backward, decoder forward(+backward), classifier
forward+backward, optimizer update — each jitted alone at flagship
geometry with device-staged inputs and force-last timing (every scalar
readback on the tunneled platform is a blocking ~28 ms roundtrip; see
profile_stages.time_prog). The anchor is the REAL donated
``train_many(…, "train", 25)`` multi-step program, same as bench.py's
train arm.

Also runs a BATCH-SIZE LADDER of the anchor: a latency-bound step (serial
GRU scans at fixed sequence length dominate) should give near-constant
step time as the batch grows, i.e. near-free MFU — the one cheap lever if
the floor argument holds. Per-batch FLOPs come from tools/train_flops.py
(killable CPU child, cached per geometry).

Writes docs/train_stage_profile.json.

    python tools/train_profile.py [--reps 10] [--batches 32,64,128]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--steps", type=int, default=25, help="anchor multi-step count")
    ap.add_argument("--batches", default="32,64,128",
                    help="train_many anchor batch-size ladder (first = Hps default profile)")
    ap.add_argument("-o", "--out", default=str(REPO / "docs" / "train_stage_profile.json"))
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/zstts_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from zerospeech_tts_tpu.config import Hps
    from zerospeech_tts_tpu.data.device_dataset import DeviceDataset
    from zerospeech_tts_tpu.train import Solver

    batches = [int(b) for b in args.batches.split(",")]
    hps = Hps(n_speakers=8)  # flagship geometry (seg 128 / 513 feat / 1024-bit MBV)
    peak = 197e12  # v5e bf16 peak; training runs f32 matmuls at the bf16 MXU rate

    # toy on-device corpus, same shape as bench.py's train arm
    import h5py
    import tempfile

    rng = np.random.default_rng(0)
    fd, h5p = tempfile.mkstemp(suffix=".h5")
    os.close(fd)
    with h5py.File(h5p, "w") as f:
        sp = {}
        for i in range(8):
            spk = f"S{i:02d}"
            sp[spk] = i
            f.create_dataset(
                f"train/{spk}/{spk}_0/lin",
                data=rng.uniform(0, 1, (500, hps.n_feat)).astype(np.float32),
            )
        f.attrs["speakers"] = json.dumps(sp)

    # ---------------------------------------------------------- timing core
    def _force(out):
        leaf = jax.tree.leaves(out)[0]
        float(jnp.ravel(leaf)[0])

    def _stage_arrays(arrs):
        out = tuple(jnp.asarray(a) for a in arrs)
        for a in out:
            float(jnp.ravel(a)[0])
        return out

    def time_prog(fn, make_set, n_reps):
        sets = [make_set(r) for r in range(n_reps + 1)]
        _force(fn(*sets[-1]))  # compile + warm
        t0 = time.perf_counter()
        outs = [fn(*s) for s in sets[:n_reps]]
        _force(outs[-1])
        return (time.perf_counter() - t0) / n_reps

    def train_flops(batch_size: int) -> float | None:
        """Per-step FLOPs from the killable CPU child (HLO flop counts are
        arithmetic, backend-independent); cached per geometry."""
        cache_p = "/tmp/zstts_train_flops.json"
        key = f"b{batch_size}_s{hps.seg_len}_f{hps.n_feat}_jax{jax.__version__}"
        cache = {}
        try:
            with open(cache_p) as f:
                cache = json.load(f)
        except (OSError, ValueError):
            pass
        if key in cache:
            return cache[key]
        try:
            out = subprocess.run(
                [sys.executable, str(REPO / "tools" / "train_flops.py"),
                 "--batch-size", str(batch_size)],
                capture_output=True, text=True, timeout=600, cwd=REPO,
                env={**os.environ, "JAX_PLATFORMS": "cpu"},
            )
            fl = json.loads(out.stdout.strip().splitlines()[-1])["flops_per_step"]
        except Exception as e:
            print(f"train_flops b{batch_size} failed: {e!r}", file=sys.stderr)
            return None
        cache[key] = fl
        with open(cache_p, "w") as f:
            json.dump(cache, f)
        return fl

    results: dict = {
        "geometry": {"seg_len": hps.seg_len, "n_feat": hps.n_feat,
                     "emb_size": hps.emb_size, "n_speakers": 8},
        "method": ("isolated stage programs + donated train_many anchor, "
                   "device-staged inputs, force-last timing"),
        "reps": args.reps,
        "platform": jax.devices()[0].platform,
    }

    # ---------------------------------------------------------- anchor ladder
    ladder = []
    sol0 = None
    for b in batches:
        h = hps.replace(batch_size=b)
        ds = DeviceDataset.from_h5(h5p, h, stats=False)
        sol = Solver(h)
        if b == batches[0]:
            sol0 = sol
        st = sol.init_state(jax.random.PRNGKey(0))
        st, m = sol.train_many(st, ds, "train", args.steps)  # compile
        _ = float(m["loss_rec"])
        t0 = time.perf_counter()
        st, m = sol.train_many(st, ds, "train", args.steps)
        _ = float(m["loss_rec"])
        dt = time.perf_counter() - t0
        sps = args.steps / dt
        fl = train_flops(b)
        entry = {
            "batch_size": b,
            "steps_per_sec": round(sps, 1),
            "step_ms": round(1e3 * dt / args.steps, 2),
            "gflops_per_step": round(fl / 1e9, 2) if fl else None,
            "mfu_vs_bf16_peak": round(fl * sps / peak, 4) if fl else None,
        }
        ladder.append(entry)
        print(f"anchor b={b}: {entry}", file=sys.stderr)
    results["train_many_ladder"] = ladder

    # ---------------------------------------------------------- stage programs
    sol = sol0
    b = batches[0]
    st = sol.init_state(jax.random.PRNGKey(0))
    enc_p, dec_p, clf_p = st.enc, st.dec, st.clf
    opt_enc, opt_dec, opt_clf = st.opt_enc, st.opt_dec, st.opt_clf
    n_lat = hps.seg_len // hps.downsample
    key = jax.random.PRNGKey(7)

    def x_set(rot):
        r = np.random.default_rng(100 + rot)
        return _stage_arrays(
            (r.uniform(0, 1, (b, hps.seg_len, hps.n_feat)).astype(np.float32),)
        )

    def z_set(rot):
        r = np.random.default_rng(200 + rot)
        return _stage_arrays(
            ((r.uniform(size=(b, n_lat, hps.emb_size)) < 0.5).astype(np.float32),)
        )

    spk = jnp.asarray(np.arange(b, dtype=np.int32) % 8)

    @jax.jit
    def enc_fwd(x):
        z = sol._encode_latent(enc_p, x, key, train=True)
        return jnp.sum(z, dtype=jnp.float32)

    @jax.jit
    def enc_fwdbwd(x):
        def loss(p):
            return jnp.sum(sol._encode_latent(p, x, key, train=True))

        return jax.tree.leaves(jax.grad(loss)(enc_p))[0].sum()

    @jax.jit
    def dec_fwd(z):
        xh = sol.decoder.apply(
            dec_p, z, spk, train=True, rngs={"dropout": key}
        )
        return jnp.sum(xh, dtype=jnp.float32)

    @jax.jit
    def dec_fwdbwd(z):
        def loss(p):
            return jnp.sum(
                sol.decoder.apply(p, z, spk, train=True, rngs={"dropout": key})
            )

        return jax.tree.leaves(jax.grad(loss)(dec_p))[0].sum()

    @jax.jit
    def clf_fwdbwd(z):
        def loss(p):
            logits = sol.classifier.apply(p, z, train=True, rngs={"dropout": key})
            return jnp.mean(logits)

        return jax.tree.leaves(jax.grad(loss)(clf_p))[0].sum()

    @jax.jit
    def opt_update(eps):
        # grads derive from a per-rep staged scalar: an argument-free
        # closure over compile-time-constant params would (a) be foldable
        # by XLA and (b) repeat the identical (program, buffers) dispatch
        # every rep, which the tunnel can dedupe — the exact methodology
        # bug the bench's distinct-buffers-per-rep rule exists to avoid.
        # The p+eps construction costs one fused elementwise add per
        # param, so the reading slightly OVERSTATES the optimizer stage.
        outs = []
        for g, o, p in ((enc_p, opt_enc, enc_p), (dec_p, opt_dec, dec_p), (clf_p, opt_clf, clf_p)):
            u, _ = sol.tx.update(jax.tree.map(lambda q: q + eps, g), o, p)
            outs.append(jax.tree.leaves(u)[0].sum())
        return sum(outs)

    def eps_set(rot):
        return _stage_arrays((np.float32(1e-3 * (rot + 1)),))

    stages = {
        "enc_fwd_ms": (enc_fwd, x_set),
        "enc_fwdbwd_ms": (enc_fwdbwd, x_set),
        "dec_fwd_ms": (dec_fwd, z_set),
        "dec_fwdbwd_ms": (dec_fwdbwd, z_set),
        "clf_fwdbwd_ms": (clf_fwdbwd, z_set),
        "opt_update_ms": (opt_update, eps_set),
    }
    for name, (fn, mk) in stages.items():
        dt = time_prog(fn, mk, args.reps)
        results[name] = round(1e3 * dt, 2)
        print(f"{name}: {results[name]} ms", file=sys.stderr)
    results["sum_stages_ms"] = round(
        results["enc_fwdbwd_ms"] + results["dec_fwdbwd_ms"]
        + results["clf_fwdbwd_ms"] + results["opt_update_ms"], 2
    )
    results["anchor_step_ms"] = ladder[0]["step_ms"]

    os.unlink(h5p)
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
