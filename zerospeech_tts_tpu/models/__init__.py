"""L3 — model library (ref model.py, SURVEY.md §2 rows "NN building blocks"
through "PatchDiscriminator").

Flax modules, pure functions of (params, inputs, rng): conv-bank Encoder,
MBV Gumbel-softmax discretizer, speaker-conditioned Decoder/Generator,
adversarial SpeakerClassifier, and the stage-2 PatchDiscriminator.
Layout is [batch, time, channels] throughout (XLA-native conv layout).
"""

from zerospeech_tts_tpu.models.layers import ConvBank, pixel_shuffle_1d  # noqa: F401
from zerospeech_tts_tpu.models.mbv import (  # noqa: F401
    discretize,
    gumbel_softmax,
    hard_units,
    unit_bits,
    straight_through,
)
from zerospeech_tts_tpu.models.encoder import Encoder  # noqa: F401
from zerospeech_tts_tpu.models.decoder import Decoder  # noqa: F401
from zerospeech_tts_tpu.models.classifier import SpeakerClassifier  # noqa: F401
from zerospeech_tts_tpu.models.patch_discriminator import PatchDiscriminator  # noqa: F401
