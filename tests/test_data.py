"""L2 data-layer tests: corpus build contract, per-speaker stats, segment
index, loader batch shapes + pairs (SURVEY.md §2 L2 rows)."""

import json

import h5py
import numpy as np
import pytest

from zerospeech_tts_tpu.config import AudioConfig, Hps
from zerospeech_tts_tpu.data import SegmentLoader, build_corpus, make_segment_index, speaker_of
from zerospeech_tts_tpu.dsp.wavio import save_wav

ACFG = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20)


def _toy_corpus(root, n_utt=2, seconds=0.6):
    rng = np.random.default_rng(0)
    for split, speakers in [("train", ["S01", "S02", "V001"]), ("test", ["S09"])]:
        sub = "unit" if split == "train" else ""
        for spk in speakers:
            for i in range(n_utt):
                n = int(seconds * 16000)
                t = np.arange(n) / 16000
                f0 = 200 + 60 * int(spk[-1]) + 25 * i
                y = (0.4 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.standard_normal(n)).astype(
                    np.float32
                )
                d = root / split / sub if sub else root / split
                save_wav(d / f"{spk}_{i:04d}.wav", y, 16000)
    return root


def test_speaker_of_prefix_and_dir(tmp_path):
    from pathlib import Path

    assert speaker_of(Path("x/S015_0361841101.wav")) == "S015"
    assert speaker_of(Path("x/V001-abc.wav")) == "V001"
    assert speaker_of(Path("corpus/train/unit/SPKR7/utterance.wav")) == "SPKR7"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    _toy_corpus(root)
    h5 = tmp_path_factory.mktemp("data") / "ds.h5"
    manifest = build_corpus(root, h5, ACFG, trim=False)
    return root, h5, manifest


def test_build_corpus_layout(corpus):
    root, h5, manifest = corpus
    assert manifest["counts"] == {"train": 6, "test": 2}
    assert set(manifest["speakers"]) == {"S01", "S02", "V001", "S09"}
    with h5py.File(h5, "r") as f:
        mel = f["train/S01/S01_0000/mel"][:]
        lin = f["train/S01/S01_0000/lin"][:]
        assert mel.shape[1] == ACFG.n_mels and lin.shape[1] == ACFG.n_freq
        assert mel.shape[0] == lin.shape[0] > 50
        assert 0 <= mel.min() and mel.max() <= 1
        # per-speaker stats present for train speakers
        for spk in ("S01", "S02", "V001"):
            assert f[f"stats/{spk}/mel_mean"].shape == (ACFG.n_mels,)
            assert (f[f"stats/{spk}/lin_std"][:] > 0).all()
        assert json.loads(f.attrs["speakers"]) == manifest["speakers"]


def test_segment_index_and_loader(corpus, tmp_path):
    root, h5, manifest = corpus
    hps = Hps(batch_size=4, seg_len=32, n_feat=ACFG.n_freq, n_speakers=len(manifest["speakers"]))
    idx = tmp_path / "index.json"
    entries = make_segment_index(h5, idx, hps.seg_len, 100, seed=1, pair_grid=hps.downsample)
    assert len(entries) == 100
    assert all(e["t0"] >= 0 and "t1" in e for e in entries)

    with SegmentLoader(
        h5, idx, hps, feat="lin", target_speakers=["V001"], prefetch=0, pairs=True
    ) as dl:
        b = next(iter(dl))
        assert b["x"].shape == (4, 32, ACFG.n_freq)
        assert b["x2"].shape == (4, 32, ACFG.n_freq)  # pairs=True opt-in
        assert b["spk"].shape == (4,) and b["spk"].dtype == np.int32
        # stage-2 reals come only from V001
        v = dl.speakers["V001"]
        assert set(np.asarray(b["spk_real"]).tolist()) == {v}
        # pairs come from the same utterance -> statistically correlated
        assert np.isfinite(np.asarray(b["x"])).all()


def test_loader_prefetch_thread(corpus, tmp_path):
    root, h5, manifest = corpus
    hps = Hps(batch_size=2, seg_len=16, n_feat=ACFG.n_freq, n_speakers=4)
    idx = tmp_path / "index.json"
    make_segment_index(h5, idx, hps.seg_len, 50, seed=2)
    with SegmentLoader(h5, idx, hps, prefetch=2) as dl:
        it = iter(dl)
        batches = [next(it) for _ in range(5)]
        assert all(b["x"].shape == (2, 16, ACFG.n_freq) for b in batches)


def test_segment_index_rejects_too_long(corpus, tmp_path):
    root, h5, manifest = corpus
    with pytest.raises(ValueError, match="no utterance"):
        make_segment_index(h5, tmp_path / "i.json", 10_000, 10)


def test_loader_prefetch_propagates_errors(corpus, tmp_path):
    """A worker-thread failure must surface in next(), not hang training."""
    hps = Hps(batch_size=2, seg_len=16, n_feat=999, n_speakers=4)  # wrong n_feat
    idx = tmp_path / "i.json"
    make_segment_index(corpus[1], idx, hps.seg_len, 20, seed=0)
    with SegmentLoader(corpus[1], idx, hps, prefetch=2) as dl:
        with pytest.raises(ValueError, match="n_feat"):
            next(iter(dl))


def test_pair_grid_snapping_and_loader_dt(corpus, tmp_path):
    """pair_grid snaps t1-t0 to the downsample grid; the loader surfaces
    the offset as pair_dt alongside x2."""
    root, h5, manifest = corpus
    hps = Hps(
        batch_size=4, seg_len=32, n_feat=ACFG.n_freq, n_speakers=len(manifest["speakers"])
    )
    idx = tmp_path / "index.json"
    entries = make_segment_index(h5, idx, hps.seg_len, 200, seed=3, pair_grid=8)
    dts = [e["t1"] - e["t0"] for e in entries]
    assert all(d % 8 == 0 for d in dts)
    assert any(d != 0 for d in dts)
    assert all(abs(d) <= hps.seg_len for d in dts)

    with SegmentLoader(h5, idx, hps, feat="lin", prefetch=0, pairs=True) as dl:
        b = next(iter(dl))
        assert b["pair_dt"].shape == (4,) and b["pair_dt"].dtype == np.int32
        assert (np.abs(b["pair_dt"]) <= hps.seg_len).all()


def test_speaker_id_overflow_rejected(corpus, tmp_path):
    """Speaker ids >= n_speakers must fail fast: Embed/integer-CE clamp
    out-of-range ids silently under jit (ADVICE r1)."""
    root, h5, manifest = corpus
    hps = Hps(batch_size=2, seg_len=16, n_feat=ACFG.n_freq, n_speakers=2)  # corpus has 4
    idx = tmp_path / "i.json"
    make_segment_index(h5, idx, hps.seg_len, 20, seed=0)
    with pytest.raises(ValueError, match="n_speakers"):
        SegmentLoader(h5, idx, hps)
    from zerospeech_tts_tpu.data.device_dataset import DeviceDataset

    with pytest.raises(ValueError, match="n_speakers"):
        DeviceDataset.from_h5(h5, hps, stats=False)


def test_loader_reseed_changes_stream(corpus, tmp_path):
    """reseed(step) on resume must give a different batch sequence than a
    fresh position-0 stream (ADVICE r1: no replaying consumed batches)."""
    root, h5, manifest = corpus
    hps = Hps(batch_size=4, seg_len=16, n_feat=ACFG.n_freq, n_speakers=4)
    idx = tmp_path / "i.json"
    make_segment_index(h5, idx, hps.seg_len, 200, seed=0)
    with SegmentLoader(h5, idx, hps, prefetch=0) as a, SegmentLoader(
        h5, idx, hps, prefetch=0
    ) as b:
        b.reseed(1234)
        xa, xb = next(iter(a))["x"], next(iter(b))["x"]
        assert not np.allclose(xa, xb)


def test_converter_requires_speaker_names_with_stats(corpus):
    """With speaker_norm stats attached, omitting src/tgt names must raise
    instead of silently using global statistics (ADVICE r1)."""
    import jax

    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.data.speaker_norm import SpeakerStats
    from zerospeech_tts_tpu.train import Solver

    root, h5, manifest = corpus
    hps = Hps(
        batch_size=2, seg_len=32, n_feat=ACFG.n_freq, n_speakers=4,
        emb_size=32, spk_emb_size=8, bank_size=4, bank_channels=8, conv_channels=16,
    )
    stats = SpeakerStats.load(h5, "lin")
    sol = Solver(hps)
    st = sol.init_state(jax.random.PRNGKey(0))
    conv = Converter(hps, ACFG, st.enc, st.dec, batch_size=1, bucket_frames=32, stats=stats)
    feats = [np.random.default_rng(0).uniform(0, 1, (32, ACFG.n_freq)).astype(np.float32)]
    with pytest.raises(ValueError, match="speaker_norm"):
        conv.convert_features_multi(feats, [0])
    with pytest.raises(ValueError, match="speaker_norm"):
        conv.encode_units(feats)
    with pytest.raises(ValueError, match="tgt_name"):
        conv.convert_wav(np.random.default_rng(1).standard_normal(16000).astype(np.float32), 0)
    # explicit names work
    u, w = conv.convert_features_multi(feats, [0], tgt_names=["V001"], src_speakers=["S01"])
    assert u[0].shape[1] == hps.emb_size


def test_build_corpus_pipeline_equivalence(tmp_path):
    """The pipelined corpus build (decode thread + deferred readback) must
    produce byte-identical features, stats, and speaker map to the
    synchronous loop."""
    root = tmp_path / "corpus"
    _toy_corpus(root)
    a = build_corpus(root, tmp_path / "a.h5", ACFG, trim=False, pipeline=0)
    b = build_corpus(root, tmp_path / "b.h5", ACFG, trim=False, pipeline=3)
    assert a["speakers"] == b["speakers"] and a["counts"] == b["counts"]
    with h5py.File(tmp_path / "a.h5", "r") as fa, h5py.File(tmp_path / "b.h5", "r") as fb:
        def walk(g, out, prefix=""):
            for k, v in g.items():
                p = f"{prefix}/{k}"
                (walk(v, out, p) if isinstance(v, h5py.Group) else out.append(p))
            return out
        ka, kb = walk(fa, []), walk(fb, [])
        assert ka == kb
        for k in ka:
            np.testing.assert_array_equal(fa[k][:], fb[k][:])


def test_shipped_hps_variants_load():
    """Both shipped hps JSONs (english + surprise) must load into valid,
    hashable (jit-static) configs with consistent geometry."""
    from pathlib import Path

    from zerospeech_tts_tpu.config import load_configs

    hps_dir = Path(__file__).resolve().parent.parent / "zerospeech_tts_tpu" / "hps"
    files = sorted(hps_dir.glob("*.json"))
    assert {f.name for f in files} >= {"zerospeech.json", "surprise.json"}
    for f in files:
        hps, acfg = load_configs(f)
        hash(hps), hash(acfg)  # jit-static usability
        assert hps.seg_len % hps.downsample == 0
        assert hps.n_feat == acfg.n_fft // 2 + 1  # lin-feature geometry
        assert hps.n_speakers > 0 and hps.lambda_pair >= 0


def test_loader_rejects_offgrid_pair_index(corpus, tmp_path):
    """An index whose pair offsets are off the downsample grid (built
    without pair_grid=hps.downsample) must be refused when pairs=True —
    the solver would silently compare misaligned latents."""
    root, h5, manifest = corpus
    hps = Hps(batch_size=2, seg_len=32, n_feat=ACFG.n_freq, n_speakers=4)
    idx = tmp_path / "offgrid.json"
    entries = make_segment_index(h5, idx, hps.seg_len, 200, seed=5)  # pair_grid=1
    assert any((e["t1"] - e["t0"]) % hps.downsample for e in entries)
    with pytest.raises(ValueError, match="grid"):
        SegmentLoader(h5, idx, hps, pairs=True)
    # pairs=False doesn't care
    with SegmentLoader(h5, idx, hps, pairs=False, prefetch=0) as dl:
        assert "x2" not in next(iter(dl))


def test_build_corpus_consumer_failure_unblocks_producer(tmp_path, monkeypatch):
    """If the consumer dies mid-build, the producer thread must terminate
    instead of blocking forever on the bounded queue."""
    import threading
    import time as _time

    from zerospeech_tts_tpu.data import corpus as corpus_mod

    root = tmp_path / "corpus"
    _toy_corpus(root, n_utt=6)

    calls = {"n": 0}
    orig = corpus_mod.dsp_audio.get_spectrograms

    def boom(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise RuntimeError("synthetic consumer failure")
        return orig(*a, **kw)

    monkeypatch.setattr(corpus_mod.dsp_audio, "get_spectrograms", boom)
    n0 = threading.active_count()
    with pytest.raises(RuntimeError, match="synthetic"):
        build_corpus(root, tmp_path / "x.h5", ACFG, trim=False, pipeline=1)
    deadline = _time.time() + 10
    while threading.active_count() > n0 and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= n0, "producer thread leaked"


def test_sharded_build_and_merge_matches_single(tmp_path):
    """3-shard build + merge (SURVEY §7 hard-part 6: per-speaker stats as a
    segmented reduction across processes) must reproduce the single-process
    corpus: identical feature trees/arrays and per-speaker stats to float64
    reassociation tolerance; the merged speaker map is deterministic."""
    from zerospeech_tts_tpu.data import merge_corpus_shards

    root = tmp_path / "corpus"
    _toy_corpus(root, n_utt=3)
    single = build_corpus(root, tmp_path / "one.h5", ACFG, trim=False)
    shards = []
    for i in range(3):
        sp = tmp_path / f"sh{i}.h5"
        m = build_corpus(root, sp, ACFG, trim=False, n_shards=3, shard_index=i)
        shards.append(sp)
        with h5py.File(sp, "r") as f:
            assert "stats" not in f and "stats_raw" in f
            assert json.loads(f.attrs["shard"]) == {"index": i, "of": 3}
    merged = merge_corpus_shards(shards, tmp_path / "merged.h5")
    assert merged["counts"] == single["counts"]
    assert set(merged["speakers"]) == set(single["speakers"])

    with h5py.File(tmp_path / "one.h5", "r") as fa, \
         h5py.File(tmp_path / "merged.h5", "r") as fb:
        def walk(g, out, prefix=""):
            for k, v in g.items():
                p = f"{prefix}/{k}"
                (walk(v, out, p) if isinstance(v, h5py.Group) else out.append(p))
            return out
        ka = sorted(p for p in walk(fa, []) if not p.startswith("/stats"))
        kb = sorted(p for p in walk(fb, []) if not p.startswith("/stats"))
        assert ka == kb
        for k in ka:
            np.testing.assert_array_equal(fa[k][:], fb[k][:])
        # stats: exact reduction up to float64 sum reassociation
        sa = sorted(p for p in walk(fa["stats"], [], "/stats"))
        sb = sorted(p for p in walk(fb["stats"], [], "/stats"))
        assert sa == sb
        for k in sa:
            np.testing.assert_allclose(fa[k][:], fb[k][:], rtol=0, atol=1e-10)

    # the merged corpus must drive the segment index + loader
    idx = tmp_path / "idx.json"
    hps = Hps(seg_len=8, n_feat=20, downsample=2, n_speakers=8, batch_size=4)
    entries = make_segment_index(tmp_path / "merged.h5", idx, 8, 64, seed=0, pair_grid=2)
    assert entries
    with SegmentLoader(tmp_path / "merged.h5", idx, hps, feat="mel") as loader:
        batch = next(iter(loader))
    assert batch["x"].shape == (4, 8, 20)


def test_merge_rejects_overlapping_shards(tmp_path):
    from zerospeech_tts_tpu.data import merge_corpus_shards

    root = tmp_path / "corpus"
    _toy_corpus(root)
    a = tmp_path / "a.h5"
    build_corpus(root, a, ACFG, trim=False, n_shards=2, shard_index=0)
    b = tmp_path / "b.h5"
    build_corpus(root, b, ACFG, trim=False, n_shards=2, shard_index=0)  # same slice
    with pytest.raises(ValueError, match="duplicate utterance"):
        merge_corpus_shards([a, b], tmp_path / "m.h5")
