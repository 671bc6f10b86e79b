"""L5 — CLI driver (ref main.py:~1-150; SURVEY.md §2 "CLI driver").

Verbs mirror the reference's modes:

    zstts preprocess      (ref --preprocess: corpus build + segment index)
    zstts train1          (ref stage-1: pretrain_AE -> pretrain_C -> train)
    zstts train2          (ref stage-2 patchGAN; requires stage-1 ckpt)
    zstts convert         (ref --test: corpus conversion + unit dump)
    zstts convert-single  (ref --test_single: one wav -> target speaker)

Path flags keep the reference spellings (-hps, -dataset_path, -index_path,
-ckpt_dir, -result_dir, --load_model). ``--platform cpu`` forces CPU (the
axon TPU plugin ignores JAX_PLATFORMS, so this must be a config update).
``--mesh data=4,model=2`` trains over a jax.sharding Mesh.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

from zerospeech_tts_tpu.config import DEFAULT_HPS_PATH, load_configs


def _positive_int(s: str) -> int:
    v = int(s)
    if v < 1:
        raise argparse.ArgumentTypeError(f"must be a positive integer, got {s}")
    return v


def _common(p: argparse.ArgumentParser):
    p.add_argument("-hps", "--hps", default=str(DEFAULT_HPS_PATH), help="hps JSON path")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--mesh", default=None, help="e.g. data=8 or data=4,model=2")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR (SURVEY.md §5 tracing)")
    p.add_argument("--check-numerics", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN/Inf)")
    p.add_argument("--matmul-precision", default=None,
                   choices=["bfloat16", "tensorfloat32", "float32", "highest"],
                   help="override jax_default_matmul_precision. NOTE: on TPU "
                        "the DEFAULT already runs f32 matmuls at bf16 MXU "
                        "rate (1 pass — verified numerics-identical to an "
                        "explicit 'bfloat16' on v5e), so there is no faster "
                        "setting; 'float32'/'highest' buy 6-pass f32 "
                        "accuracy at ~2.8x the matmul cost (measured cost "
                        "in docs/performance.md)")
    p.add_argument("--allow-schema-migration", action="store_true",
                   help="accept checkpoints written by an older TrainState "
                        "schema (missing fields filled from init); default "
                        "is to refuse structure mismatches")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="zstts", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("preprocess", help="build h5 corpus + segment index (ref --preprocess)")
    _common(p)
    p.add_argument("--corpus", required=True, help="ZeroSpeech-layout corpus dir (has train/, test/)")
    p.add_argument("-dataset_path", "--dataset_path", required=True)
    p.add_argument("-index_path", "--index_path", required=True)
    p.add_argument("--n-samples", type=int, default=500_000, help="segment index size")
    p.add_argument("--no-trim", action="store_true")
    p.add_argument("--shard", default=None, metavar="I/N",
                   help="build only utterance slice I of N (multi-host corpus "
                        "build): writes a shard file with raw per-speaker "
                        "stat partials to -dataset_path and skips the segment "
                        "index; combine with --merge-shards afterwards")
    p.add_argument("--merge-shards", nargs="+", default=None, metavar="SHARD_H5",
                   help="merge shard files (from --shard runs) into "
                        "-dataset_path, finalize per-speaker stats exactly, "
                        "and build the segment index; --corpus is ignored")
    p.add_argument("--workers", type=int, default=1, metavar="N",
                   help="single-host parallel build: N shard subprocesses "
                        "then an automatic merge (the multi-process corpus "
                        "pipeline; each worker decodes + featurizes its slice)")

    for stage in ("train1", "train2"):
        p = sub.add_parser(stage)
        _common(p)
        p.add_argument("-dataset_path", "--dataset_path", required=True)
        p.add_argument("-index_path", "--index_path", required=True)
        p.add_argument("-ckpt_dir", "--ckpt_dir", required=True)
        p.add_argument("--log_dir", default=None)
        p.add_argument("--load_model", nargs="?", const="latest", default=None,
                       metavar="STEP|DIR",
                       help="resume training: bare = latest ckpt in -ckpt_dir "
                            "(also automatic; see --fresh); a STEP number or a "
                            "checkpoint DIR (or DIR/STEP) selects a specific "
                            "model to start from")
        p.add_argument("--fresh", action="store_true",
                       help="ignore existing checkpoints and start from scratch")
        p.add_argument("--iters-override", type=int, default=None, help="shrink all phases (smoke)")
        p.add_argument("--feat", default="lin", choices=["lin", "mel"])
        p.add_argument("--targets", nargs="*", default=None, help="stage-2 target speakers")
        p.add_argument("--device-data", action="store_true",
                       help="stage the train split in device HBM and run "
                            "log_interval steps per dispatch (TPU-native fast path)")
        p.add_argument("--data-bf16", action="store_true",
                       help="stage the device-data arena in bfloat16 (halves HBM)")
        p.add_argument("--no-pairs", action="store_true",
                       help="drop the same-utterance pair fields from stage-1 "
                            "batches (disables the hps.lambda_pair objective)")
        p.add_argument("--train-batch-size", type=int, default=None,
                       help="override hps.batch_size for training. The step is "
                            "GRU-latency-bound at fixed seg_len, so larger "
                            "batches are near-free MFU (measured 32/64/128 -> "
                            "0.31/0.42/0.45; docs/train_stage_profile.json)")

    p = sub.add_parser("convert", help="corpus conversion + unit extraction (ref --test)")
    _common(p)
    p.add_argument("-dataset_path", "--dataset_path", default=None)
    p.add_argument("-ckpt_dir", "--ckpt_dir", default=None)
    p.add_argument("--from-export", default=None, metavar="DIR",
                   help="run from a `zstts export` bundle instead of "
                        "-dataset_path/-ckpt_dir (lean deployment artifact)")
    p.add_argument("-result_dir", "--result_dir", required=True)
    p.add_argument("--target", nargs="*", default=None, help="target speakers (default: V*)")
    p.add_argument("--split", default="test")
    p.add_argument("--gl-iters", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--from-wavs", default=None, metavar="DIR",
                   help="convert straight from a directory of wavs (ref --test "
                        "reads test/*.wav): on-device frontend, no h5 features "
                        "needed (-dataset_path still supplies the speaker map/stats)")
    p.add_argument("--units-only", action="store_true",
                   help="dump discrete units without synthesis (ref enc_only)")
    p.add_argument("--bf16", action="store_true",
                   help="run encoder/decoder matmuls in bfloat16 (2x MXU rate; "
                        "may flip borderline units)")
    p.add_argument("--enc-f32", action="store_true",
                   help="keep the ENCODER in float32 under --bf16: removes "
                        "nearly all bf16 unit flips, but is NOT bit-identical "
                        "to the all-f32 program (XLA couples the encoder's "
                        "last ulp to the decoder dtype). For challenge-exact "
                        "units drop --bf16 entirely — the Griffin-Lim kernel "
                        "is bf16-internal either way, so all-f32 costs ~0.1% "
                        "on-chip")
    p.add_argument("--wire-mulaw", action="store_true",
                   help="8-bit mu-law companding on both PCM wire directions "
                        "(halves the dominant transfer bytes on remote/tunneled "
                        "hosts at ~38 dB SNR; files on disk stay PCM16)")
    p.add_argument("--wire-uint8", action="store_true",
                   help="quantize features to uint8 on the host->device wire "
                        "(per-utterance min/max, dequantized on-device; halves "
                        "input bytes, ~0.997 unit agreement)")
    p.add_argument("--feat", default="lin", choices=["lin", "mel"],
                   help="features the model was trained on")
    p.add_argument("--adaptive-buckets", type=_positive_int, default=None, metavar="K",
                   help="fit <=K length-bucket edges to the corpus length "
                        "histogram before converting (same program count as "
                        "uniform bucketing, less padding waste; edges stay "
                        "multiples of the 64-frame grid)")
    p.add_argument("--bucket-overhead-target", type=float, default=None, metavar="FRAC",
                   help="with --adaptive-buckets K: use the SMALLEST number "
                        "of edges (<=K) whose planned padding overhead is "
                        "<= FRAC (e.g. 0.08), instead of always spending K "
                        "program compiles")
    p.add_argument("--frame-budget", type=_positive_int, default=None, metavar="N",
                   help="rows*frames per dispatch budget: short length "
                        "buckets batch more utterances per dispatch (largest "
                        "power of two within the budget, <=128 rows), cutting "
                        "per-dispatch overhead on mixed-length corpora; try "
                        "batch_size * longest_bucket_frames")
    p.add_argument("--bucket-cost-model", default="frames",
                   choices=["frames", "executed"],
                   help="with --adaptive-buckets K: objective the edge "
                        "planner minimizes. 'frames' = padded frames; "
                        "'executed' = true dispatched rows*frames under this "
                        "converter's chunking (tail-shape rounding, "
                        "--frame-budget caps) — dummy batch rows run the "
                        "full program, so the frames-optimal plan can still "
                        "lose wall time to tail rounding across thin buckets")
    p.add_argument("--dispatch-cost-frames", type=float, default=0.0,
                   metavar="N",
                   help="with --bucket-cost-model executed: charge each "
                        "dispatch N frame-rows of overhead in the plan (set "
                        "high on wire/tunnel-bound hosts where every dispatch "
                        "costs ~fixed wall time; 0 for locally attached "
                        "devices)")
    p.add_argument("--load_model", nargs="?", const="latest", default=None,
                   metavar="STEP|DIR",
                   help="convert from a specific checkpoint: STEP number, "
                        "checkpoint DIR, or DIR/STEP (default: latest in "
                        "-ckpt_dir)")

    p = sub.add_parser("eval", help="challenge metrics: unit bitrate, recon L1, unit stats")
    _common(p)
    p.add_argument("--units", default=None, metavar="DIR", help="unit-file dir -> bitrate + stats")
    p.add_argument("-dataset_path", "--dataset_path", default=None)
    p.add_argument("-ckpt_dir", "--ckpt_dir", default=None)
    p.add_argument("--recon", action="store_true", help="reconstruction L1 (needs dataset+ckpt)")
    p.add_argument("--stability", action="store_true",
                   help="unit stability under window shifts (needs dataset+ckpt)")
    p.add_argument("--abx", default=None, metavar="ITEMFILE",
                   help="mini-ABX discriminability over dumped units (needs "
                        "--units DIR; item lines: utt start end cls spk, "
                        "latent-frame indices)")
    p.add_argument("--abx-across", action="store_true",
                   help="across-speaker ABX instead of within-speaker")
    p.add_argument("--abx-max-triples", type=int, default=None, metavar="N",
                   help="cap triples per (class-pair, speaker-context) cell "
                        "by uniform sampling (bounds runtime on real ZR19 "
                        "item files; cells under the cap stay exact)")
    p.add_argument("--feat", default="lin", choices=["lin", "mel"])
    p.add_argument("--split", default="train")
    p.add_argument("--n-segments", type=int, default=64)

    p = sub.add_parser(
        "serve",
        help="HTTP conversion service: warm programs + request micro-batching "
             "(deployment mode; no reference counterpart)",
    )
    _common(p)
    p.add_argument("-dataset_path", "--dataset_path", default=None, help="h5 (speaker map/stats)")
    p.add_argument("-ckpt_dir", "--ckpt_dir", default=None)
    p.add_argument("--from-export", default=None, metavar="DIR",
                   help="serve from a `zstts export` bundle (no h5/ckpt needed)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--batch-size", type=int, default=8,
                   help="program batch = micro-batch ceiling per dispatch")
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="max extra latency spent gathering a micro-batch")
    p.add_argument("--request-timeout", type=float, default=900.0,
                   help="per-request wait budget in seconds; the FIRST "
                        "request of each new utterance-length bucket pays "
                        "that bucket's XLA compile, so keep this generous")
    p.add_argument("--max-body-mb", type=int, default=64,
                   help="reject request bodies above this size with 400 "
                        "(0 = unlimited)")
    p.add_argument("--max-frames", type=int, default=32768,
                   help="reject utterances longer than this many frames "
                        "(each new length bucket costs an XLA compile; "
                        "0 = unlimited)")
    p.add_argument("--warmup-buckets", default=None, metavar="FRAMES,FRAMES",
                   help="precompile these utterance-length buckets before "
                        "accepting clients (e.g. 256,512,1024) so the first "
                        "request of each doesn't pay the XLA compile")
    p.add_argument("--warmup-targets", type=int, default=1,
                   help="target-set size to warm (program shape depends on "
                        "the COUNT of targets)")
    p.add_argument("--gl-iters", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--enc-f32", action="store_true",
                   help="f32 encoder under --bf16 (fewer unit flips; "
                        "for bit-exact units drop --bf16 — see convert)")
    p.add_argument("--wire-mulaw", action="store_true")
    p.add_argument("--feat", default="lin", choices=["lin", "mel"])
    p.add_argument("--load_model", nargs="?", const="latest", default=None,
                   metavar="STEP|DIR", help="checkpoint selection (see convert)")

    p = sub.add_parser(
        "export",
        help="write a lean inference bundle (enc+dec params, speaker map, "
             "stats, hps) for convert/serve --from-export",
    )
    _common(p)
    p.add_argument("-dataset_path", "--dataset_path", required=True, help="h5 (speaker map/stats)")
    p.add_argument("-ckpt_dir", "--ckpt_dir", required=True)
    p.add_argument("--out", required=True, metavar="DIR", help="bundle output directory")
    p.add_argument("--feat", default="lin", choices=["lin", "mel"],
                   help="features the model was trained on (recorded in the bundle)")
    p.add_argument("--load_model", nargs="?", const="latest", default=None,
                   metavar="STEP|DIR", help="checkpoint selection (see convert)")

    p = sub.add_parser(
        "submission",
        help="package `zstts convert` results into a ZeroSpeech challenge "
             "archive (metadata.yaml + <lang>/test/{txt,wav}), or validate one",
    )
    p.add_argument("-hps", "--hps", default=str(DEFAULT_HPS_PATH),
                   help="hps JSON (sets the latent frame duration for bitrate)")
    p.add_argument("--lang", action="append", default=None,
                   metavar="NAME=RESULT_DIR:TARGET",
                   help="language -> convert result dir + submitted target "
                        "voice, e.g. english=out:V001 (repeatable)")
    p.add_argument("-o", "--out", default="submission.zip", help="archive path")
    p.add_argument("--validate", default=None, metavar="ZIP",
                   help="validate an existing archive instead of building")
    p.add_argument("--author", default=None)
    p.add_argument("--affiliation", default=None)
    p.add_argument("--system-description", default=None)
    p.add_argument("--auxiliary1", default=None, help="auxiliary embedding 1 description")
    p.add_argument("--auxiliary2", default=None, help="auxiliary embedding 2 description")
    p.add_argument("--parallel-data", action="store_true",
                   help="declare the system used parallel training data")
    p.add_argument("--external-data", action="store_true",
                   help="declare the system used external (non-challenge) data")

    p = sub.add_parser("convert-single", help="single-utterance VC (ref --test_single)")
    _common(p)
    p.add_argument("-dataset_path", "--dataset_path", default=None, help="h5 (for speaker map)")
    p.add_argument("-ckpt_dir", "--ckpt_dir", default=None)
    p.add_argument("--from-export", default=None, metavar="DIR",
                   help="run from a `zstts export` bundle (no h5/ckpt needed)")
    p.add_argument("-result_dir", "--result_dir", required=True)
    p.add_argument("--source", required=True, help="source wav path")
    p.add_argument("--target", required=True, help="target speaker name")
    p.add_argument("--gl-iters", type=int, default=None)
    p.add_argument("--load_model", nargs="?", const="latest", default=None,
                   metavar="STEP|DIR", help="checkpoint selection (see convert)")

    return ap


def _setup_platform(args):
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif args.platform in ("tpu", "axon"):
        pass  # default env platform
    if getattr(args, "check_numerics", False):
        jax.config.update("jax_debug_nans", True)
    if getattr(args, "matmul_precision", None):
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    # multi-host: no-op unless the JAX cluster env vars are present
    # (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)
    from zerospeech_tts_tpu.parallel import initialize

    if initialize():
        print(f"jax.distributed initialized: {jax.process_count()} processes")
    return jax


class _MaybeProfile:
    """jax.profiler trace context when --profile is given (no-op otherwise)."""

    def __init__(self, args):
        self.dir = getattr(args, "profile", None)

    def __enter__(self):
        if self.dir:
            import jax

            jax.profiler.start_trace(self.dir)
        return self

    def __exit__(self, *exc):
        if self.dir:
            import jax

            jax.profiler.stop_trace()
            print(f"profiler trace -> {self.dir}")


def _mesh_from_arg(spec: str | None):
    if not spec:
        return None
    from zerospeech_tts_tpu.parallel import make_mesh

    axes = {}
    for part in spec.split(","):
        k, v = part.split("=")
        axes[k.strip()] = int(v)
    return make_mesh(**axes)


def _restore(solver, ckpt, mesh=None, step=None):
    import jax

    from zerospeech_tts_tpu.parallel import place_state

    template = solver.init_state(jax.random.PRNGKey(solver.hps.seed))
    if mesh is not None:
        # TP-sharded template when the mesh has a model axis > 1 (orbax
        # restores straight into the template's shardings), pure DP
        # replication otherwise
        template = place_state(template, mesh)
    return ckpt.restore(template, step=step)


def _load_model_spec(args):
    """Parse --load_model into (ckpt_dir_override, step).

    The reference flag loads a specific model file; here the value may be
    a STEP number (restore that step from -ckpt_dir), a checkpoint DIR
    (restore its latest step), or a step subdirectory like ckpts/12000.
    Bare --load_model keeps the auto 'latest from -ckpt_dir' behavior."""
    v = getattr(args, "load_model", None)
    if v in (None, "latest"):
        return None, None
    s = str(v)
    if s.lstrip("-").isdigit():
        return None, int(s)
    p = Path(s)
    if p.name.isdigit() and (p.parent / p.name).exists():
        return str(p.parent), int(p.name)  # a step dir inside an orbax tree
    return s, None


def _restore_source(args, hps, default_mgr):
    """(manager, step) to restore from, honoring --load_model overrides."""
    dir_ov, step = _load_model_spec(args)
    if dir_ov is None:
        return default_mgr, step
    from zerospeech_tts_tpu.train import CheckpointManager

    mgr = CheckpointManager(
        dir_ov, hps=hps, read_only=True,  # a pure load must not mutate the source
        allow_migration=getattr(args, "allow_schema_migration", False),
    )
    return mgr, step


def _parse_shard(spec: str) -> tuple[int, int]:
    try:
        i, n = spec.split("/")
        i, n = int(i), int(n)
    except ValueError:
        sys.exit(f"--shard wants I/N (e.g. 0/4), got {spec!r}")
    if not (0 <= i < n):
        sys.exit(f"--shard index {i} not in [0, {n})")
    return i, n


def cmd_preprocess(args):
    _setup_platform(args)
    from zerospeech_tts_tpu.data import build_corpus, make_segment_index, merge_corpus_shards

    hps, acfg = load_configs(args.hps)
    t0 = time.time()
    n = [0]

    def progress(split, path):
        n[0] += 1
        if n[0] % 200 == 0:
            print(f"  [{time.time() - t0:7.1f}s] {n[0]} utterances ({split})", flush=True)

    if args.merge_shards:
        manifest = merge_corpus_shards(args.merge_shards, args.dataset_path)
        print(f"merged {len(args.merge_shards)} shards: {manifest['counts']} "
              f"speakers={len(manifest['speakers'])}")
    elif args.shard is not None:
        i, k = _parse_shard(args.shard)
        manifest = build_corpus(
            args.corpus, args.dataset_path, acfg, trim=not args.no_trim,
            progress=progress, n_shards=k, shard_index=i,
        )
        print(f"shard {i}/{k}: {manifest['counts']} -> {args.dataset_path} "
              f"(raw stat partials; run --merge-shards when all shards exist)")
        return
    elif args.workers > 1:
        import subprocess

        shard_paths = [f"{args.dataset_path}.shard{i}of{args.workers}"
                       for i in range(args.workers)]
        procs = []
        for i, spath in enumerate(shard_paths):
            cmd = [sys.executable, "-m", "zerospeech_tts_tpu.cli", "preprocess",
                   "--corpus", args.corpus, "-dataset_path", spath,
                   "-index_path", args.index_path,  # unused by shard runs
                   "--hps", args.hps, "--shard", f"{i}/{args.workers}"]
            if args.no_trim:
                cmd.append("--no-trim")
            if args.platform:
                cmd += ["--platform", args.platform]
            procs.append(subprocess.Popen(cmd))
        rcs = [p.wait() for p in procs]
        if any(rcs):
            sys.exit(f"shard worker(s) failed: rcs={rcs}")
        manifest = merge_corpus_shards(shard_paths, args.dataset_path)
        for spath in shard_paths:
            os.unlink(spath)
        print(f"{args.workers}-worker build: {manifest['counts']} "
              f"speakers={len(manifest['speakers'])}")
    else:
        manifest = build_corpus(
            args.corpus, args.dataset_path, acfg, trim=not args.no_trim, progress=progress
        )
        print(f"corpus: {manifest['counts']} speakers={len(manifest['speakers'])}")
    entries = make_segment_index(
        args.dataset_path, args.index_path, hps.seg_len, args.n_samples, seed=hps.seed,
        pair_grid=hps.downsample,  # latent-aligned pair offsets (solver pair term)
    )
    print(f"index: {len(entries)} segments -> {args.index_path}")
    print(f"preprocess done in {time.time() - t0:.1f}s")


def _make_training(args):
    import jax

    from zerospeech_tts_tpu.data import SegmentLoader
    from zerospeech_tts_tpu.train import CheckpointManager, Logger, Solver

    hps, acfg = load_configs(args.hps)
    if getattr(args, "train_batch_size", None):
        hps = hps.replace(batch_size=args.train_batch_size)
    mesh = _mesh_from_arg(args.mesh)
    sharding = None
    if mesh is not None:
        from zerospeech_tts_tpu.parallel import batch_sharding

        sharding = batch_sharding(mesh)
    solver = Solver(hps)
    stats = None
    if hps.speaker_norm:
        from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats

        stats = SpeakerStats.load(args.dataset_path, args.feat)
    if getattr(args, "device_data", False):
        import jax.numpy as jnp

        from zerospeech_tts_tpu.data.device_dataset import (
            DeviceDataset,
            ShardedDeviceDataset,
        )

        dd_dtype = jnp.bfloat16 if getattr(args, "data_bf16", False) else jnp.float32
        if mesh is not None:
            # shard the feature arena over the mesh 'data' axis: each chip
            # holds corpus/D and samples its batch slice locally
            loader = ShardedDeviceDataset.from_h5(
                args.dataset_path, hps, mesh, feat=args.feat,
                target_speakers=args.targets, dtype=dd_dtype,
            )
        else:
            loader = DeviceDataset.from_h5(
                args.dataset_path, hps, feat=args.feat,
                target_speakers=args.targets,  # stats auto-loaded per hps.speaker_norm
                dtype=dd_dtype,
            )
    else:
        loader = SegmentLoader(
            args.dataset_path,
            args.index_path,
            hps,
            feat=args.feat,
            target_speakers=args.targets,
            sharding=sharding,
            seed=hps.seed,
            # stage-1 consumes the reference's same-utterance pair (x2);
            # stage-2 batches don't need it
            pairs=(args.cmd == "train1") and not getattr(args, "no_pairs", False),
        )
    ckpt = CheckpointManager(
        args.ckpt_dir, hps=hps,
        allow_migration=getattr(args, "allow_schema_migration", False),
    )
    logger = Logger(args.log_dir or (Path(args.ckpt_dir) / "logs"))
    return jax, hps, mesh, solver, loader, ckpt, logger


def cmd_train1(args):
    _setup_platform(args)
    jax, hps, mesh, solver, loader, ckpt, logger = _make_training(args)
    ov = args.iters_override
    phases = [
        ("pretrain_AE", ov or hps.enc_pretrain_iters),
        ("pretrain_C", ov or hps.dis_pretrain_iters),
        ("train", ov or hps.iters),
    ]
    src_mgr, src_step = _restore_source(args, hps, ckpt)
    explicit = args.load_model is not None and (src_mgr is not ckpt or src_step is not None)
    if explicit and args.fresh:
        sys.exit("--fresh contradicts --load_model STEP|DIR: pick one")
    if explicit or (not args.fresh and ckpt.latest_step() is not None):
        # auto-resume from the latest step (SURVEY.md §5 failure recovery);
        # --load_model [STEP|DIR] selects a specific model instead
        state = _restore(solver, src_mgr, mesh, step=src_step)
        if src_mgr is not ckpt:
            src_mgr.close()
        print(f"resumed from step {int(state.step)}")
        if hasattr(loader, "reseed"):  # don't replay already-consumed batches
            loader.reseed(int(state.step))
        # skip the parts of the stage-1 schedule already completed: phases
        # run in order, so the global step locates us inside the schedule
        done = int(state.step)
        trimmed = []
        for mode, iters in phases:
            run_now = max(0, min(iters, iters - done))
            done = max(0, done - iters)
            trimmed.append((mode, run_now))
        phases = trimmed
        if all(n == 0 for _, n in phases):
            print("stage-1 schedule already complete; nothing to do")
    else:
        state = solver.init_state(jax.random.PRNGKey(hps.seed))
        if mesh is not None:
            from zerospeech_tts_tpu.parallel import place_state

            state = place_state(state, mesh)
    from zerospeech_tts_tpu.data.device_dataset import DeviceDataset, ShardedDeviceDataset

    bsh = None
    if mesh is not None:
        from zerospeech_tts_tpu.parallel import batch_sharding as _bs

        bsh = _bs(mesh)
    if isinstance(loader, (DeviceDataset, ShardedDeviceDataset)):
        with _MaybeProfile(args):
            for mode, iters in phases:
                if iters == 0:
                    continue
                print(f"== stage-1 phase {mode}: {iters} iters (device-data)")
                state = solver.train_device(
                    state, loader, mode, iters, logger=logger, ckpt=ckpt,
                    batch_sharding=bsh, pairs=not getattr(args, "no_pairs", False),
                )
    else:
        with loader, _MaybeProfile(args):
            it = iter(loader)
            for mode, iters in phases:
                if iters == 0:
                    continue
                print(f"== stage-1 phase {mode}: {iters} iters")
                state = solver.train(state, it, mode, iters, logger=logger, ckpt=ckpt)
    ckpt.save(state, wait=True)
    ckpt.close()
    logger.close()
    print(f"stage-1 done at step {int(state.step)}; ckpt -> {args.ckpt_dir}")


def cmd_train2(args):
    _setup_platform(args)
    jax, hps, mesh, solver, loader, ckpt, logger = _make_training(args)
    src_mgr, src_step = _restore_source(args, hps, ckpt)
    if src_mgr.latest_step() is None:
        sys.exit("train2 requires a stage-1 checkpoint (ref: stage 2 starts from stage-1 weights)")
    state = _restore(solver, src_mgr, mesh, step=src_step)
    if src_mgr is not ckpt:
        src_mgr.close()
    print(f"stage-2 from step {int(state.step)}")
    if hasattr(loader, "reseed"):  # don't replay already-consumed batches
        loader.reseed(int(state.step))
    iters = args.iters_override or hps.patch_iters
    from zerospeech_tts_tpu.data.device_dataset import DeviceDataset, ShardedDeviceDataset

    bsh = None
    if mesh is not None:
        from zerospeech_tts_tpu.parallel import batch_sharding as _bs

        bsh = _bs(mesh)
    if isinstance(loader, (DeviceDataset, ShardedDeviceDataset)):
        with _MaybeProfile(args):
            state = solver.train_device(
                state, loader, "patchGAN", iters, logger=logger, ckpt=ckpt, batch_sharding=bsh
            )
    else:
        with loader, _MaybeProfile(args):
            state = solver.train(state, iter(loader), "patchGAN", iters, logger=logger, ckpt=ckpt)
    ckpt.save(state, wait=True)
    ckpt.close()
    logger.close()
    print(f"stage-2 done at step {int(state.step)}")


def _configs_and_bundle(args):
    """(hps, acfg, bundle): with ``--from-export`` the bundle's recorded
    configs are authoritative (the model was trained with them); otherwise
    -hps + -dataset_path/-ckpt_dir as usual."""
    if getattr(args, "from_export", None):
        from zerospeech_tts_tpu.export import load_export

        b = load_export(args.from_export)
        return b.hps, b.acfg, b
    if not (getattr(args, "dataset_path", None) and getattr(args, "ckpt_dir", None)):
        sys.exit("pass -dataset_path and -ckpt_dir, or --from-export DIR")
    hps, acfg = load_configs(args.hps)
    return hps, acfg, None


def _load_converter(args, hps, acfg, bundle=None):
    from zerospeech_tts_tpu.convert import Converter

    if bundle is not None:
        enc_p, dec_p, stats = bundle.enc, bundle.dec, bundle.stats
        feat = bundle.feat  # recorded at export time; --feat is ignored
    else:
        from zerospeech_tts_tpu.train import CheckpointManager, Solver

        solver = Solver(hps)
        ckpt = CheckpointManager(  # conversion only LOADS: never mutate the dir
            args.ckpt_dir, hps=hps, read_only=True,
            allow_migration=getattr(args, "allow_schema_migration", False),
        )
        src_mgr, src_step = _restore_source(args, hps, ckpt)
        state = _restore(solver, src_mgr, step=src_step)
        if src_mgr is not ckpt:
            src_mgr.close()
        ckpt.close()
        enc_p, dec_p = state.enc, state.dec
        feat = getattr(args, "feat", "lin")
        stats = None
        if hps.speaker_norm:
            from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats

            stats = SpeakerStats.load(args.dataset_path, feat)
    return Converter(
        hps,
        acfg,
        enc_p,
        dec_p,
        gl_iters=getattr(args, "gl_iters", None),
        batch_size=getattr(args, "batch_size", 8),
        stats=stats,
        mesh=_mesh_from_arg(args.mesh),
        feat=feat,
        compute_dtype="bfloat16" if getattr(args, "bf16", False) else "float32",
        encoder_dtype="float32" if getattr(args, "enc_f32", False) else None,
        wire="uint8" if getattr(args, "wire_uint8", False) else "bf16",
        pcm_wire="mulaw" if getattr(args, "wire_mulaw", False) else "int16",
        frame_budget=getattr(args, "frame_budget", None),
    )


def _speaker_map(dataset_path, hps=None):
    from zerospeech_tts_tpu.data.corpus import load_speaker_map

    speakers = load_speaker_map(dataset_path)
    if hps is not None:
        from zerospeech_tts_tpu.data.device_dataset import check_speaker_ids

        check_speaker_ids(speakers, hps)
    return speakers


def cmd_convert(args):
    _setup_platform(args)
    from zerospeech_tts_tpu.convert import convert_corpus

    hps, acfg, bundle = _configs_and_bundle(args)
    if bundle is not None:
        speakers = dict(bundle.speakers)
        if not (args.from_wavs or args.dataset_path):
            sys.exit(
                "--from-export has no h5 features: pass --from-wavs DIR "
                "(on-device frontend) or also give -dataset_path"
            )
    else:
        speakers = _speaker_map(args.dataset_path, hps)
    targets = args.target or sorted(s for s in speakers if s.startswith("V"))
    if not targets:
        sys.exit("no target speakers given and none named V* in the corpus")
    missing = [t for t in targets if t not in speakers]
    if missing:
        sys.exit(f"target speakers {missing} not in corpus speaker map")
    conv = _load_converter(args, hps, acfg, bundle)
    t0 = time.time()
    with _MaybeProfile(args):
        if args.from_wavs:
            from zerospeech_tts_tpu.convert import convert_wav_dir

            out = convert_wav_dir(
                conv,
                args.from_wavs,
                args.result_dir,
                {t: speakers[t] for t in targets},
                sr=acfg.sr,
                limit=args.limit,
                units_only=args.units_only,
                adaptive_buckets=args.adaptive_buckets,
                bucket_overhead_target=args.bucket_overhead_target,
                bucket_cost_model=args.bucket_cost_model,
                dispatch_cost_frames=args.dispatch_cost_frames,
            )
        else:
            out = convert_corpus(
                conv,
                args.dataset_path,
                args.result_dir,
                {t: speakers[t] for t in targets},
                split=args.split,
                sr=acfg.sr,
                limit=args.limit,
                units_only=args.units_only,
                adaptive_buckets=args.adaptive_buckets,
                bucket_overhead_target=args.bucket_overhead_target,
                bucket_cost_model=args.bucket_cost_model,
                dispatch_cost_frames=args.dispatch_cost_frames,
            )
    dt = time.time() - t0
    print(
        f"converted {out['n_utterances']} utterances x {len(targets)} targets "
        f"in {dt:.1f}s ({out['n_wavs'] / dt:.2f} wav/s) -> {out['result_dir']}"
    )


def cmd_eval(args):
    _setup_platform(args)
    from zerospeech_tts_tpu import eval as ev

    hps, acfg = load_configs(args.hps)
    report = {}
    if args.units:
        frame_seconds = acfg.hop_length * hps.downsample / acfg.sr
        unit_arrays = ev.load_unit_files(args.units)
        report["bitrate"] = ev.unit_bitrate(args.units, frame_seconds, units=unit_arrays)
        report["units"] = ev.unit_stats(args.units, units=unit_arrays)
    if args.abx:
        if not args.units:
            sys.exit("--abx needs --units DIR (the dumped unit files)")
        items = ev.load_abx_items(args.abx, args.units)
        report["abx"] = ev.abx_discriminability(
            items, across_speaker=args.abx_across,
            max_triples_per_cell=args.abx_max_triples,
        )
    if args.recon or args.stability:
        if not (args.dataset_path and args.ckpt_dir):
            sys.exit("--recon/--stability need -dataset_path and -ckpt_dir")
        from zerospeech_tts_tpu.train import CheckpointManager, Solver

        solver = Solver(hps)
        ckpt = CheckpointManager(  # eval only LOADS: never mutate the dir
            args.ckpt_dir, hps=hps, read_only=True,
            allow_migration=getattr(args, "allow_schema_migration", False),
        )
        state = _restore(solver, ckpt)
        ckpt.close()
    if args.stability:
        report["stability"] = ev.unit_stability(
            solver, state, args.dataset_path, hps, feat=args.feat, split=args.split
        )
    if args.recon:
        report["reconstruction"] = ev.reconstruction_l1(
            solver, state, args.dataset_path, hps,
            feat=args.feat, split=args.split, n_segments=args.n_segments,
        )
    if not report:
        sys.exit("nothing to evaluate: pass --units DIR, --recon, and/or --stability")
    print(json.dumps(report, indent=2))


def cmd_convert_single(args):
    _setup_platform(args)
    from zerospeech_tts_tpu.convert import convert_single

    hps, acfg, bundle = _configs_and_bundle(args)
    speakers = dict(bundle.speakers) if bundle is not None else _speaker_map(args.dataset_path, hps)
    if args.target not in speakers:
        sys.exit(f"target {args.target!r} not in corpus speaker map {sorted(speakers)[:10]}...")
    conv = _load_converter(args, hps, acfg, bundle)
    out = convert_single(
        conv, args.source, args.target, speakers[args.target], args.result_dir, sr=acfg.sr
    )
    print(json.dumps(out))


def cmd_serve(args):
    _setup_platform(args)
    from zerospeech_tts_tpu.serve import ConversionService, serve_http

    hps, acfg, bundle = _configs_and_bundle(args)
    speakers = dict(bundle.speakers) if bundle is not None else _speaker_map(args.dataset_path, hps)
    conv = _load_converter(args, hps, acfg, bundle)
    service = ConversionService(
        conv, speakers, window_ms=args.batch_window_ms, max_batch=args.batch_size,
        request_timeout=args.request_timeout,
        max_body_bytes=args.max_body_mb << 20, max_frames=args.max_frames,
    )
    if args.warmup_buckets:
        buckets = [int(x) for x in args.warmup_buckets.split(",") if x.strip()]
        dt = service.warmup(buckets, n_targets=args.warmup_targets)
        print(f"warmed {len(buckets)} bucket programs in {dt:.1f}s", flush=True)
    httpd = serve_http(service, host=args.host, port=args.port)
    host, port = httpd.server_address[:2]
    print(
        f"serving on http://{host}:{port}  "
        f"(batch {args.batch_size}, window {args.batch_window_ms}ms, "
        f"{len(speakers)} speakers; POST /convert?targets=..., /units; GET /healthz)",
        flush=True,
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        httpd.server_close()
        service.close()


def cmd_export(args):
    _setup_platform(args)
    from zerospeech_tts_tpu.export import export_model
    from zerospeech_tts_tpu.train import CheckpointManager, Solver

    hps, acfg = load_configs(args.hps)
    speakers = _speaker_map(args.dataset_path, hps)
    solver = Solver(hps)
    ckpt = CheckpointManager(  # export only LOADS: never mutate the dir
        args.ckpt_dir, hps=hps, read_only=True,
        allow_migration=getattr(args, "allow_schema_migration", False),
    )
    src_mgr, src_step = _restore_source(args, hps, ckpt)
    state = _restore(solver, src_mgr, step=src_step)
    if src_mgr is not ckpt:
        src_mgr.close()
    ckpt.close()
    stats = None
    if hps.speaker_norm:
        from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats

        stats = SpeakerStats.load(args.dataset_path, args.feat)
    out = export_model(
        args.out, hps, acfg, state.enc, state.dec, speakers,
        stats=stats, feat=args.feat, step=int(state.step),
    )
    print(json.dumps(out))


def cmd_submission(args):
    # pure host-side file tool: no JAX, no platform setup
    from zerospeech_tts_tpu.submission import build_submission, validate_submission

    hps, acfg = load_configs(args.hps)
    frame_seconds = acfg.hop_length * hps.downsample / acfg.sr
    if args.validate:
        report = validate_submission(args.validate, frame_seconds=frame_seconds, sr=acfg.sr)
    else:
        if not args.lang:
            sys.exit("pass --lang NAME=RESULT_DIR:TARGET at least once (or --validate ZIP)")
        langs = {}
        for spec in args.lang:
            try:
                name, rest = spec.split("=", 1)
                result_dir, target = rest.rsplit(":", 1)
            except ValueError:
                sys.exit(f"bad --lang spec {spec!r}: want NAME=RESULT_DIR:TARGET")
            langs[name] = (result_dir, target)
        meta = {
            k: v
            for k, v in (
                ("author", args.author),
                ("affiliation", args.affiliation),
                ("system description", args.system_description),
                ("auxiliary1 description", args.auxiliary1),
                ("auxiliary2 description", args.auxiliary2),
            )
            if v is not None
        }
        if args.parallel_data:
            meta["system uses parallel data"] = True
        if args.external_data:
            meta["system uses external data"] = True
        report = build_submission(
            args.out, langs, metadata=meta, frame_seconds=frame_seconds, sr=acfg.sr
        )
        report["archive"] = args.out
    print(json.dumps(report, indent=2))
    if not report["ok"]:
        sys.exit(1)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    {
        "preprocess": cmd_preprocess,
        "train1": cmd_train1,
        "train2": cmd_train2,
        "convert": cmd_convert,
        "convert-single": cmd_convert_single,
        "eval": cmd_eval,
        "serve": cmd_serve,
        "export": cmd_export,
        "submission": cmd_submission,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
