"""Native C++ wav decoder parity vs the scipy oracle (skipped when the
shared library isn't built; `make -C native` builds it)."""

import numpy as np
import pytest

from zerospeech_tts_tpu.data import native
from zerospeech_tts_tpu.dsp import wavio

pytestmark = pytest.mark.skipif(not native.available(), reason="libwavreader.so not built")


def _tone(n=8000, pad=2000):
    t = np.arange(n) / 16000
    y = np.concatenate(
        [np.zeros(pad), 0.5 * np.sin(2 * np.pi * 440 * t), np.zeros(pad)]
    ).astype(np.float32)
    return y


def test_decode_pcm16_bit_exact(tmp_path):
    y = _tone()
    p = tmp_path / "a.wav"
    wavio.save_wav(p, y, 16000)
    a = native.load_wav_native(p, 16000)
    b = wavio.load_wav(p, 16000)
    np.testing.assert_array_equal(a, b)


def test_trim_matches_oracle(tmp_path):
    y = _tone()
    p = tmp_path / "a.wav"
    wavio.save_wav(p, y, 16000)
    a = native.load_wav_native(p, 16000)
    ta = native.trim_native(a, 20.0)
    tb = wavio.trim_silence(a, 20.0)
    np.testing.assert_array_equal(ta, tb)


def test_decode_stereo_float(tmp_path):
    import scipy.io.wavfile

    rng = np.random.default_rng(0)
    y = rng.uniform(-0.5, 0.5, (4000, 2)).astype(np.float32)
    p = tmp_path / "st.wav"
    scipy.io.wavfile.write(str(p), 16000, y)
    a = native.load_wav_native(p, 16000)
    b = wavio.load_wav(p, 16000)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_resample_close_to_scipy(tmp_path):
    import scipy.io.wavfile

    t = np.arange(8000) / 8000
    y = (0.5 * np.sin(2 * np.pi * 100 * t) * 32767).astype(np.int16)
    p = tmp_path / "r8.wav"
    scipy.io.wavfile.write(str(p), 8000, y)
    a = native.load_wav_native(p, 16000)
    b = wavio.load_wav(p, 16000)
    n = min(len(a), len(b))
    # linear vs polyphase resampling: close for low-frequency content
    np.testing.assert_allclose(a[100 : n - 100], b[100 : n - 100], atol=5e-3)


def test_decode_error_on_garbage(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"this is not a wav file at all")
    with pytest.raises(ValueError, match="native wav decode failed"):
        native.load_wav_native(p, 16000)


def test_load_and_trim_fallback_contract(tmp_path):
    y = _tone()
    p = tmp_path / "a.wav"
    wavio.save_wav(p, y, 16000)
    out = native.load_and_trim(p, 16000, 20.0)
    ref = wavio.trim_silence(wavio.load_wav(p, 16000), 20.0)
    np.testing.assert_array_equal(out, ref)
