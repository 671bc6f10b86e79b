"""zerospeech_tts_tpu — TPU-native rebuild of andi611/ZeroSpeech-TTS-without-T.

A two-stage, text-free speech synthesis / voice-conversion framework for the
ZeroSpeech 2019 "TTS without T" challenge, re-designed TPU-first:

* DSP frontend (STFT / log-mel / normalize) and Griffin-Lim vocoding are
  jitted XLA programs (MXU matmul-DFT path + Pallas fused kernels), not
  host-side librosa loops.
* Models (conv-bank Encoder, MBV Gumbel-softmax discretizer, speaker-
  conditioned Decoder, adversarial SpeakerClassifier, stage-2
  PatchDiscriminator) are Flax modules trained under jit over a
  ``jax.sharding.Mesh`` (data / model axes).
* Conversion (encode -> binarize -> decode -> Griffin-Lim) is one XLA
  program per padded bucket.

Layer map mirrors SURVEY.md §1 (reference: andi611/ZeroSpeech-TTS-without-T,
reconstructed — see SURVEY.md provenance note):

* L0 config        -> :mod:`zerospeech_tts_tpu.config`        (ref utils.py:~15-60 Hps)
* L1 DSP           -> :mod:`zerospeech_tts_tpu.dsp`           (ref preprocess.py / utils.py DSP)
* L2 data          -> :mod:`zerospeech_tts_tpu.data`          (ref make_datasets.py / dataloader.py)
* L3 models        -> :mod:`zerospeech_tts_tpu.models`        (ref model.py)
* L4 training      -> :mod:`zerospeech_tts_tpu.train`         (ref solver.py)
* L5 CLI/convert   -> :mod:`zerospeech_tts_tpu.cli` / :mod:`zerospeech_tts_tpu.convert`
                                                              (ref main.py / convert.py)
* serving (absent in reference) -> :mod:`zerospeech_tts_tpu.serve`
  (warm-program HTTP service with request micro-batching)
* parallel (absent in reference, first-class here) -> :mod:`zerospeech_tts_tpu.parallel`
* ops (Pallas/XLA kernels, the TPU analogue of native kernels) -> :mod:`zerospeech_tts_tpu.ops`
"""

__version__ = "0.1.0"

from zerospeech_tts_tpu.config import AudioConfig, Hps  # noqa: F401
