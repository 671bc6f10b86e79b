"""L1 — DSP / audio-feature library (ref preprocess.py + utils.py DSP).

Host-side pieces (wav IO, trim) live in :mod:`.wavio`; the mel filterbank is
built in numpy in :mod:`.mel`; all per-sample compute (preemphasis, STFT,
mel, normalize, Griffin-Lim) is jitted JAX in :mod:`.audio` so the frontend
and the vocoder run on-device as single XLA programs.
"""

from zerospeech_tts_tpu.dsp.mel import mel_filterbank  # noqa: F401
from zerospeech_tts_tpu.dsp.audio import (  # noqa: F401
    get_spectrograms,
    griffin_lim,
    melspectrogram2wav,
    spectrogram2wav,
)
from zerospeech_tts_tpu.dsp.wavio import load_wav, save_wav, trim_silence  # noqa: F401
