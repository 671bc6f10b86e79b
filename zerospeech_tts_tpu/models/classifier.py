"""SpeakerClassifier — the stage-1 adversary (ref model.py:~280-340).

Latent sequence [B, T', emb] -> speaker logits [B, n_speakers]. Trained to
classify the true speaker from the latent; the encoder is trained against
it so the discrete units become speaker-invariant (the disentanglement
mechanism of Chou et al. 2018 that the reference builds on).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from zerospeech_tts_tpu.config import Hps
from zerospeech_tts_tpu.models.layers import ConvNorm


class SpeakerClassifier(nn.Module):
    hps: Hps

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = self.hps
        y = z
        for i, ch in enumerate([h.conv_channels, h.conv_channels, h.conv_channels // 2]):
            y = ConvNorm(ch, 3, ns=h.ns, name=f"conv_{i}")(y)
            y = nn.Dropout(h.dis_dp, deterministic=not train)(y)
        y = jnp.mean(y, axis=1)  # temporal pool
        y = nn.Dense(h.conv_channels // 2, name="dense")(y)
        y = nn.leaky_relu(y, h.ns)
        return nn.Dense(h.n_speakers, name="out")(y)
