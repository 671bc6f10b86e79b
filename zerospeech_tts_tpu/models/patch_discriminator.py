"""PatchDiscriminator — stage-2 GAN critic (ref model.py:~340-430).

2-D convs over the spectrogram treated as a 1-channel image; two heads:
(a) per-patch WGAN validity scores, (b) auxiliary speaker-classification
logits. No normalization layers (WGAN-GP requirement). The gradient
penalty itself lives in the solver (ref calculate_gradients_penalty).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from zerospeech_tts_tpu.config import Hps


class PatchDiscriminator(nn.Module):
    hps: Hps

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: [B, T, n_feat] -> (patch validity [B, t', f'], speaker logits
        [B, n_speakers])."""
        h = self.hps
        y = x[..., None]  # [B, T, F, 1]
        for i, ch in enumerate([32, 64, 128, 256]):
            y = nn.Conv(ch, (5, 5), strides=(2, 2), padding="SAME", name=f"conv_{i}")(y)
            y = nn.leaky_relu(y, h.ns)
            y = nn.Dropout(h.dis_dp, deterministic=not train)(y)
        patch = nn.Conv(1, (3, 3), padding="SAME", name="patch_head")(y)[..., 0]
        pooled = jnp.mean(y, axis=(1, 2))
        spk_logits = nn.Dense(h.n_speakers, name="cls_head")(pooled)
        return patch, spk_logits
