"""Encoder (ref model.py:~100-180 class Encoder).

Spectrogram segment [B, T, n_feat] -> per-frame latent logits
[B, T/downsample, emb_size, 2] (two logits per MBV dimension; the
discretizer in :mod:`.mbv` turns them into units).

Architecture (reconstructed contract, SURVEY.md §2 "Encoder"): conv bank
(1..8) -> strided conv blocks with residual connections (x8 temporal
downsample) -> dense -> bidirectional GRU -> per-dim 2-logit head.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from zerospeech_tts_tpu.config import Hps
from zerospeech_tts_tpu.models.layers import BiGRU, ConvBank, ConvNorm


class Encoder(nn.Module):
    hps: Hps

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = self.hps
        n_down = h.downsample.bit_length() - 1  # 8 -> 3 stride-2 stages
        assert 2**n_down == h.downsample

        y = ConvBank(h.bank_size, h.bank_channels, h.ns, name="bank")(x)
        y = ConvNorm(h.conv_channels, 3, ns=h.ns, name="proj")(y)

        for i in range(n_down):
            z = ConvNorm(h.conv_channels, 3, stride=2, ns=h.ns, name=f"down_{i}")(y)
            z = ConvNorm(h.conv_channels, 3, ns=h.ns, name=f"res_{i}")(z)
            # strided residual: subsample the skip path to keep shapes static
            y = z + y[:, ::2, :]
            y = nn.Dropout(h.enc_dp, deterministic=not train)(y)

        y = nn.Dense(h.emb_size, name="dense")(y)
        y = nn.leaky_relu(y, h.ns)
        y = BiGRU(h.emb_size // 2, name="rnn")(y)

        logits = nn.Dense(2 * h.emb_size, name="head")(y)
        b, t, _ = logits.shape
        return logits.reshape(b, t, h.emb_size, 2)
