"""Per-speaker normalization tests (SURVEY.md §2 "Per-speaker
normalization"): stats round-trip, loader z-norm, converter denorm with
target stats, global fallback for unseen speakers."""

import numpy as np
import pytest

from zerospeech_tts_tpu.config import AudioConfig, Hps
from zerospeech_tts_tpu.data import SegmentLoader, build_corpus, make_segment_index
from zerospeech_tts_tpu.data.speaker_norm import GLOBAL_KEY, SpeakerStats
from zerospeech_tts_tpu.dsp.wavio import save_wav

ACFG = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("snc")
    rng = np.random.default_rng(0)
    for split, speakers in [("train", ["S01", "V001"]), ("test", ["S09"])]:
        for spk in speakers:
            for i in range(2):
                t = np.arange(10000) / 16000
                amp = 0.2 if spk == "S01" else 0.6  # distinct speaker loudness
                y = (amp * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(np.float32)
                save_wav(root / split / f"{spk}_{i:04d}.wav", y, 16000)
    h5 = tmp_path_factory.mktemp("sncd") / "ds.h5"
    build_corpus(root, h5, ACFG, trim=False)
    return h5


def test_stats_load_and_fallback(corpus):
    st = SpeakerStats.load(corpus, "lin")
    assert GLOBAL_KEY in st.mean
    m1, s1 = st.get("S01")
    mg, sg = st.get("NOT_A_SPEAKER")  # falls back to global
    np.testing.assert_array_equal(mg, st.mean[GLOBAL_KEY])
    assert m1.shape == (ACFG.n_freq,)
    # distinct speakers have distinct stats
    m2, _ = st.get("V001")
    assert np.abs(m1 - m2).max() > 1e-3


def test_normalize_roundtrip(corpus):
    st = SpeakerStats.load(corpus, "lin")
    x = np.random.default_rng(0).uniform(0, 1, (7, ACFG.n_freq)).astype(np.float32)
    z = st.normalize(x, "S01")
    back = st.denormalize(z, "S01")
    np.testing.assert_allclose(back, x, atol=1e-5)
    assert np.abs(z - x).max() > 1e-3  # it actually did something


def test_loader_applies_norm(corpus, tmp_path):
    hps = Hps(batch_size=4, seg_len=16, n_feat=ACFG.n_freq, n_speakers=4, speaker_norm=True)
    idx = tmp_path / "i.json"
    make_segment_index(corpus, idx, hps.seg_len, 64, seed=0)
    with SegmentLoader(corpus, idx, hps, prefetch=0) as dl:
        b = next(iter(dl))
        # z-normed features are roughly centered, unlike [0,1] dB features
        assert b["x"].min() < -0.1
    hps0 = hps.replace(speaker_norm=False)
    with SegmentLoader(corpus, idx, hps0, prefetch=0) as dl:
        b0 = next(iter(dl))
        assert b0["x"].min() >= 0.0


def test_converter_denormalizes_with_target_stats(corpus):
    import jax

    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.train import Solver

    hps = Hps(
        batch_size=2,
        seg_len=16,
        n_feat=ACFG.n_freq,
        emb_size=16,
        spk_emb_size=4,
        n_speakers=4,
        bank_size=2,
        bank_channels=4,
        conv_channels=8,
        speaker_norm=True,
    )
    st = SpeakerStats.load(corpus, "lin")
    sol = Solver(hps)
    state = sol.init_state(jax.random.PRNGKey(0))
    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    conv_n = Converter(hps, acfg, state.enc, state.dec, stats=st, batch_size=2, bucket_frames=16)
    conv_0 = Converter(hps, acfg, state.enc, state.dec, stats=None, batch_size=2, bucket_frames=16)
    feats = [np.random.default_rng(0).uniform(0, 1, (32, ACFG.n_freq)).astype(np.float32)]
    u_n, w_n = conv_n.convert_features_multi(feats, [1], tgt_names=["V001"], src_speakers=["S01"])
    u_0, w_0 = conv_0.convert_features_multi(feats, [1])
    # source normalization changes the encoder input -> different units/wavs
    assert (u_n[0] != u_0[0]).any() or np.abs(
        w_n[0][0].astype(np.int32) - w_0[0][0].astype(np.int32)
    ).max() > 0
    assert np.isfinite(w_n[0][0].astype(np.float32)).all()
