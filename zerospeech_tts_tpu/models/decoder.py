"""Decoder / stage-2 Generator (ref model.py:~180-280 class Decoder).

Latent [B, T/downsample, emb_size] + speaker id -> spectrogram
[B, T, n_feat]. Speaker id indexes a learned embedding table that is
broadcast-concatenated at every block (ref append_emb); upsampling is
pixel_shuffle_1d x2 per stage, undoing the encoder's x8 downsample.
The same module is reused as the stage-2 patch-GAN Generator.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from zerospeech_tts_tpu.config import Hps
from zerospeech_tts_tpu.models.layers import (
    GRU,
    ConvNorm,
    append_emb,
    mirror_fill_time,
    pixel_shuffle_1d,
)


class Decoder(nn.Module):
    """``lengths`` (optional, [B] true LATENT row counts) mirrors the
    encoder's padding-invariance: pad rows are re-filled with reflected
    true rows before each conv so bucket padding cannot bleed into the
    true frames of the synthesized spectrogram (the GRU here is forward-
    only, so no scan mask is needed). Adds no parameters."""

    hps: Hps
    gru_impl: str = "scan"  # "pallas": ops/pallas_gru whole-recurrence kernel

    @nn.compact
    def __call__(
        self, z: jnp.ndarray, spk: jnp.ndarray, train: bool = False, lengths=None
    ) -> jnp.ndarray:
        h = self.hps
        n_up = h.downsample.bit_length() - 1
        emb = nn.Embed(h.n_speakers, h.spk_emb_size, name="spk_embed")(spk)  # [B, spk_emb]

        fill = (lambda v, L: mirror_fill_time(v, L)) if lengths is not None else (lambda v, L: v)
        L = lengths

        y = ConvNorm(h.conv_channels, 3, ns=h.ns, name="proj")(append_emb(fill(z, L), emb))
        for i in range(n_up):
            y = append_emb(fill(y, L), emb)
            y = ConvNorm(2 * h.conv_channels, 3, ns=h.ns, name=f"up_{i}")(y)
            y = pixel_shuffle_1d(y, 2)  # [B, 2T, conv_channels]
            if lengths is not None:
                L = 2 * L
            y = fill(y, L)
            y = y + ConvNorm(h.conv_channels, 3, ns=h.ns, name=f"res_{i}")(y)

        y = append_emb(y, emb)
        y = GRU(h.conv_channels, impl=self.gru_impl, name="rnn")(y)
        return nn.Dense(h.n_feat, name="out")(y)
