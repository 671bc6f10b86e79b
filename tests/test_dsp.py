"""DSP parity tests (SURVEY.md §4/§7: the reference has no tests; the
rebuild's DSP layer is validated against independent oracles — torch.stft
for the STFT core, numpy.fft for the DFT basis — plus round-trip and
invariant checks)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from zerospeech_tts_tpu.config import AudioConfig
from zerospeech_tts_tpu.dsp import audio as A
from zerospeech_tts_tpu.dsp import wavio
from zerospeech_tts_tpu.dsp.mel import hz_to_mel, mel_filterbank, mel_to_hz

CFG = AudioConfig(gl_iters=8)


def _chirp(n=4000, sr=16000, seed=0):
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    y = 0.5 * np.sin(2 * np.pi * (200 + 800 * t) * t) + 0.01 * rng.standard_normal(n)
    return y.astype(np.float32)


# ---------------------------------------------------------------- mel scale


def test_mel_scale_roundtrip():
    f = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, atol=1e-6)


def test_mel_scale_slaney_break():
    # linear below 1 kHz: mel(500) == 500 / (200/3)
    assert hz_to_mel(500.0) == pytest.approx(500.0 / (200.0 / 3.0))
    # 1 kHz is the break point
    assert hz_to_mel(1000.0) == pytest.approx(15.0)
    # logarithmic above: mel(6400) = 15 + 27 (since logstep = ln(6.4)/27)
    assert hz_to_mel(6400.0) == pytest.approx(42.0)


def test_mel_filterbank_invariants():
    fb = mel_filterbank(16000, 1024, 80)
    assert fb.shape == (80, 513)
    assert fb.dtype == np.float32
    assert (fb >= 0).all()
    # every filter has support, peaks are monotonically increasing in freq
    assert (fb.max(axis=1) > 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    # Slaney norm: triangle area ~= 1 in Hz measure => sum * bin_width ~ 1
    bin_hz = 16000 / 2 / 512
    areas = fb.sum(axis=1) * bin_hz
    assert np.all(areas > 0.6) and np.all(areas < 1.4)


# ---------------------------------------------------------------- STFT core


def test_stft_matches_torch():
    """torch.stft with identical settings (hann(win) padded to n_fft,
    center=True reflect) is the independent oracle."""
    y = _chirp()
    re, im = A.stft(jnp.asarray(y), CFG, method="fft")
    win = torch.hann_window(CFG.win_length, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        torch.tensor(y, dtype=torch.float64),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=win,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()  # [n_freq, T]
    np.testing.assert_allclose(np.asarray(re).T, spec.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im).T, spec.imag, atol=2e-3)


def test_stft_matmul_equals_fft():
    y = _chirp(2000)
    r1, i1 = A.stft(jnp.asarray(y), CFG, method="fft")
    r2, i2 = A.stft(jnp.asarray(y), CFG, method="matmul")
    # f32 DFT-matmul carries ~1e-3 relative error vs FFT; scale atol to peak
    tol = 2e-3 * float(jnp.max(jnp.abs(r1)))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=tol)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=tol)


def test_istft_roundtrip():
    y = _chirp()
    re, im = A.stft(jnp.asarray(y), CFG)
    out = np.asarray(A.istft(re, im, CFG))
    n = min(len(out), len(y))
    np.testing.assert_allclose(out[:n], y[:n], atol=1e-4)


def test_istft_matmul_roundtrip():
    y = _chirp(2000)
    re, im = A.stft(jnp.asarray(y), CFG, method="matmul")
    out = np.asarray(A.istft(re, im, CFG, method="matmul"))
    n = min(len(out), len(y))
    np.testing.assert_allclose(out[:n], y[:n], atol=1e-3)


def test_frame_count():
    y = _chirp(4000)
    assert A.n_frames_for(len(y), CFG) == 1 + 4000 // 200
    re, _ = A.stft(jnp.asarray(y), CFG)
    assert re.shape == (21, CFG.n_freq)


# ------------------------------------------------------------- (de)emphasis


def test_preemphasis_roundtrip():
    y = _chirp(3000)
    yp = A.preemphasis(jnp.asarray(y), 0.97)
    back = np.asarray(A.de_emphasis(yp, 0.97))
    np.testing.assert_allclose(back, y, atol=1e-4)


def test_de_emphasis_matches_scipy_lfilter():
    import scipy.signal

    x = _chirp(1000)
    ours = np.asarray(A.de_emphasis(jnp.asarray(x), 0.97))
    ref = scipy.signal.lfilter([1.0], [1.0, -0.97], x)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


# --------------------------------------------------------------- dB mapping


def test_db_norm_roundtrip():
    amp = jnp.asarray(np.geomspace(1e-4, 3.0, 64, dtype=np.float32))
    x = A.amp_to_db_norm(amp, CFG)
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    back = np.asarray(A.db_norm_to_amp(x, CFG))
    inside = (np.asarray(amp) > 10 ** ((CFG.ref_db - CFG.max_db) / 20)) & (
        np.asarray(amp) < 10 ** (CFG.ref_db / 20)
    )
    np.testing.assert_allclose(back[inside], np.asarray(amp)[inside], rtol=1e-3)


# ---------------------------------------------------------------- frontend


def test_get_spectrograms_contract():
    y = _chirp(8000)
    mel, mag = A.get_spectrograms(y, CFG)
    t = A.n_frames_for(len(y), CFG)
    assert mel.shape == (t, CFG.n_mels) and mag.shape == (t, CFG.n_freq)
    assert mel.min() >= 0 and mel.max() <= 1 and mag.max() <= 1


def test_bucket_padding_does_not_change_features():
    """ALL true frames — including the tail frames whose windows cross the
    bucket zero-padding — must match across bucket sizes: the dynamic
    true-length mirror pad keeps librosa center=True tail reflection
    semantics (the 1e-4 slack is matmul reduction-order noise between the
    differently-shaped XLA programs, not a semantics difference)."""
    y = _chirp(3777)
    mel_a, mag_a = A.get_spectrograms(y, CFG, bucket_frames=64)
    mel_b, mag_b = A.get_spectrograms(y, CFG, bucket_frames=1)
    np.testing.assert_allclose(mel_a, mel_b, atol=1e-4)
    np.testing.assert_allclose(mag_a, mag_b, atol=1e-4)


def test_mirror_pad_matches_numpy_reflect():
    """mirror_pad(y, pad, L) == np.pad(y[:L], pad, 'reflect') over the true
    span, for any L (incl. L < pad, exercising multi-fold zigzags)."""
    rng = np.random.default_rng(3)
    y = rng.standard_normal(2000).astype(np.float32)
    pad = CFG.n_fft // 2
    for L in (2, 3, 7, 100, 513, 1024, 2000):
        yz = y.copy()
        yz[L:] = 0.0  # garbage past the true length must never be read
        got = np.asarray(A.mirror_pad(jnp.asarray(yz), pad, L))
        want = np.pad(y[:L], (pad, pad), mode="reflect")
        assert np.array_equal(got[: pad + L + pad], want), L
    # static path: length=None is plain reflect padding
    got = np.asarray(A.mirror_pad(jnp.asarray(y), pad))
    assert np.array_equal(got, np.pad(y, (pad, pad), mode="reflect"))
    # buffer shorter than the pad: the static-pad-plus-fixups decomposition
    # can't apply (np.pad 'reflect' folds at most once); the full zigzag
    # fallback must still match numpy exactly
    ys = y[: pad // 2 + 1]
    for L in (2, 5, pad // 2 + 1):
        got = np.asarray(A.mirror_pad(jnp.asarray(ys), pad, L))
        want = np.pad(ys[:L], (pad, pad), mode="reflect")
        assert np.array_equal(got[: pad + L + pad], want), L


def test_bucketed_tail_frames_match_exact_length():
    """Bucket-padded frontend == exact-length frontend on every true frame,
    for every backend (the reference runs exact-length; ref
    preprocess.py:~20-80). Most shapes are bit-identical; 1e-4 covers
    cross-shape matmul reduction-order noise."""
    rng = np.random.default_rng(5)
    for n in (9000, 16383):
        y = (rng.standard_normal(n) * 0.3).astype(np.float32)
        t = A.n_frames_for(n, CFG)
        for method in ("fft", "matmul", "fused"):
            mel_b, mag_b = A.get_spectrograms(y, CFG, method=method)
            mel_e, mag_e = A.wav_to_features(jnp.asarray(y), CFG, method=method)
            for got, want in ((mel_b, mel_e), (mag_b, mag_e)):
                d = np.abs(np.asarray(got) - np.asarray(want)[:t])
                # log-domain amplification near the dB floor can push a
                # handful of rounding outliers past 1e-4; bound the bulk
                # tightly and the outliers loosely (pre-fix the TAIL frames
                # were off by ~0.5 — 3 orders of magnitude above this bar)
                assert np.quantile(d, 0.999) < 1e-4, (n, method, d.max())
                assert d.max() < 2e-3, (n, method, d.max())


# --------------------------------------------------------------- Griffin-Lim


def test_griffin_lim_recovers_sine():
    sr = CFG.sr
    t = np.arange(6000) / sr
    y = (0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    re, im = A.stft(jnp.asarray(y), CFG)
    mag = jnp.sqrt(re**2 + im**2)
    out = np.asarray(A.griffin_lim(mag, CFG, n_iters=32))
    # spectral peak must be at 440 Hz
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freqs = np.fft.rfftfreq(len(out), 1 / sr)
    assert abs(freqs[spec.argmax()] - 440) < 5
    # and reconstruction error should be small in magnitude domain
    re2, im2 = A.stft(jnp.asarray(out), CFG)
    mag2 = np.sqrt(np.asarray(re2) ** 2 + np.asarray(im2) ** 2)
    rel = np.linalg.norm(mag2[2:-2] - np.asarray(mag)[2:-2]) / np.linalg.norm(np.asarray(mag)[2:-2])
    assert rel < 0.15


def test_spectrogram2wav_end_to_end():
    y = _chirp(6000)
    _, mag = A.get_spectrograms(y, CFG, bucket_frames=1)
    out = np.asarray(A.spectrogram2wav(jnp.asarray(mag), CFG, n_iters=8))
    assert out.shape == ((mag.shape[0] - 1) * CFG.hop_length,)
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 1e-3  # produced actual audio


def test_melspectrogram2wav_runs():
    y = _chirp(4000)
    mel, _ = A.get_spectrograms(y, CFG, bucket_frames=1)
    out = np.asarray(A.melspectrogram2wav(jnp.asarray(mel), CFG, n_iters=4))
    assert np.isfinite(out).all() and out.ndim == 1


# ------------------------------------------------------------------ wav IO


def test_wav_io_roundtrip(tmp_path):
    y = _chirp(3000)
    p = tmp_path / "a.wav"
    wavio.save_wav(p, y, 16000)
    back = wavio.load_wav(p, 16000)
    assert back.dtype == np.float32
    np.testing.assert_allclose(back, y, atol=1e-3)


def test_wav_io_resample(tmp_path):
    t = np.arange(8000) / 8000.0
    y = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    p = tmp_path / "b.wav"
    import scipy.io.wavfile

    scipy.io.wavfile.write(str(p), 8000, (y * 32767).astype(np.int16))
    out = wavio.load_wav(p, 16000)
    assert abs(len(out) - 16000) < 10


def test_trim_silence():
    y = np.concatenate(
        [np.zeros(4000), 0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000), np.zeros(4000)]
    ).astype(np.float32)
    out = wavio.trim_silence(y, top_db=20)
    assert len(out) < len(y)
    assert len(out) >= 7000  # kept the tone
    assert np.abs(out).max() == np.abs(y).max()


# ------------------------------------------------------- fused matmul path


def test_stft_fused_equals_fft():
    y = _chirp(4000)
    r1, i1 = A.stft(jnp.asarray(y), CFG, method="fft")
    r2, i2 = A.stft(jnp.asarray(y), CFG, method="fused")
    tol = 2e-3 * float(jnp.max(jnp.abs(r1)))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=tol)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=tol)


def test_istft_fused_equals_fft():
    y = _chirp(4000)
    re, im = A.stft(jnp.asarray(y), CFG, method="fft")
    o1 = np.asarray(A.istft(re, im, CFG, method="fft"))
    o2 = np.asarray(A.istft(re, im, CFG, method="fused"))
    np.testing.assert_allclose(o1, o2, atol=1e-4)


def test_istft_fused_roundtrip_exact():
    y = _chirp(4000)
    re, im = A.stft(jnp.asarray(y), CFG, method="fused")
    out = np.asarray(A.istft(re, im, CFG, method="fused"))
    n = min(len(out), len(y))
    np.testing.assert_allclose(out[:n], y[:n], atol=1e-4)


def test_resolve_method():
    assert A.resolve_method(CFG, None) == "fused"  # 800 % 200 == 0
    odd = AudioConfig(win_length=700, hop_length=200)
    assert A.resolve_method(odd, None) == "fft"
    assert A.resolve_method(CFG, "matmul") == "matmul"


# ---------------------------------------------------------------- mu-law wire


def test_mulaw_codec_roundtrip_snr():
    """Host LUT compand roundtrip: speech-band SNR well above the GL
    noise floor, and digital silence survives exactly (code 128)."""
    from zerospeech_tts_tpu.dsp import mulaw

    t = np.arange(16000) / 16000.0
    y = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 1800 * t)).astype(
        np.float32
    )
    pcm = np.clip(np.rint(y * 32768.0), -32768, 32767).astype(np.int16)
    back = mulaw.mulaw_expand_host(mulaw.mulaw_compress_host(pcm))
    err = (back.astype(np.float64) - pcm.astype(np.float64)) / 32768.0
    snr = 10 * np.log10(np.mean((pcm / 32768.0) ** 2) / np.mean(err**2))
    assert snr > 30.0, snr
    assert mulaw.mulaw_compress_host(np.zeros(4, np.int16)).tolist() == [128] * 4
    assert mulaw.mulaw_expand_host(np.full(4, 128, np.uint8)).tolist() == [0] * 4


def test_mulaw_device_matches_host_luts():
    """The traced f32 compand must agree with the float64 host LUTs:
    every int16 sample encodes to the same code (+-1 on ties), and every
    code decodes to the same float within int16 quantization."""
    from zerospeech_tts_tpu.dsp import mulaw

    pcm = np.linspace(-32768, 32767, 4096).astype(np.int16)
    dev = np.asarray(mulaw.mulaw_compress_device(jnp.asarray(pcm.astype(np.float32) / 32768.0)))
    host = mulaw.mulaw_compress_host(pcm)
    assert np.abs(dev.astype(np.int32) - host.astype(np.int32)).max() <= 1

    codes = np.arange(256, dtype=np.uint8)
    dev_y = np.asarray(mulaw.mulaw_expand_device(jnp.asarray(codes)))
    host_y = mulaw.mulaw_expand_host(codes).astype(np.float64) / 32768.0
    np.testing.assert_allclose(dev_y, host_y, atol=1.0 / 32768.0)
