"""Pallas kernel tests (interpret mode on CPU; the same code compiles with
Mosaic on TPU — parity re-verified on-chip by the bench/verify drives)."""

import jax.numpy as jnp
import numpy as np

from zerospeech_tts_tpu.config import AudioConfig
from zerospeech_tts_tpu.dsp import audio as A
from zerospeech_tts_tpu.ops.pallas_frontend import fused_frontend_pallas, wav_to_features_pallas

CFG = AudioConfig()


def test_pallas_frontend_matches_xla_fused():
    y = (0.5 * np.sin(np.arange(12800) * 0.13)).astype(np.float32)
    mel1, mag1 = A.wav_to_features(jnp.asarray(y), CFG, method="fused")
    mel2, mag2 = wav_to_features_pallas(jnp.asarray(y), CFG, interpret=True)
    assert mel2.shape == mel1.shape and mag2.shape == mag1.shape
    np.testing.assert_allclose(np.asarray(mel1), np.asarray(mel2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(mag1), np.asarray(mag2), atol=2e-3)


def test_pallas_frontend_non_tile_aligned_frames():
    # 100 frames: not a multiple of the 256-row tile -> internal padding
    segs = jnp.asarray(
        np.random.default_rng(0).standard_normal((100, CFG.win_length)).astype(np.float32) * 0.1
    )
    mel, mag = fused_frontend_pallas(segs, CFG, interpret=True)
    assert mel.shape == (100, CFG.n_mels)
    assert mag.shape == (100, CFG.n_freq)
    assert float(jnp.min(mel)) >= 0.0 and float(jnp.max(mag)) <= 1.0


def test_pallas_frontend_small_config():
    cfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20)
    y = (0.4 * np.sin(np.arange(6400) * 0.2)).astype(np.float32)
    mel1, mag1 = A.wav_to_features(jnp.asarray(y), cfg, method="fused")
    mel2, mag2 = wav_to_features_pallas(jnp.asarray(y), cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(mag1), np.asarray(mag2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(mel1), np.asarray(mel2), atol=2e-3)
