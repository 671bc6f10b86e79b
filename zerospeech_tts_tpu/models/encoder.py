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
from zerospeech_tts_tpu.models.layers import BiGRU, ConvBank, ConvNorm, mirror_fill_time


class Encoder(nn.Module):
    """``lengths`` (optional, [B] true frame counts) makes encoding
    PADDING-INVARIANT for length-bucketed batches: pad rows are re-filled
    with the reflection of the true rows before every conv stage (so convs
    see exact-length reflect-pad context) and the backward GRU is masked to
    start at each row's true tail. With the bucket rule pad==0 or pad>=4
    input frames (Converter._bucket_of), true-row outputs are bit-identical
    to an exact-length (reference batch-1, ref convert.py per SURVEY §3.4)
    run of the same program. Adds no parameters; lengths=None is the
    original behavior."""

    hps: Hps
    gru_impl: str = "scan"  # "pallas": ops/pallas_gru whole-recurrence kernel
    # (same params either way; NOT bit-identical numerics — the Converter
    # keeps "scan" for the challenge-exact all-f32 encoder)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, lengths=None) -> jnp.ndarray:
        h = self.hps
        n_down = h.downsample.bit_length() - 1  # 8 -> 3 stride-2 stages
        assert 2**n_down == h.downsample

        fill = (lambda v, L: mirror_fill_time(v, L)) if lengths is not None else (lambda v, L: v)
        L = lengths

        y = ConvBank(h.bank_size, h.bank_channels, h.ns, name="bank")(fill(x, L))
        y = fill(y, L)
        y = ConvNorm(h.conv_channels, 3, ns=h.ns, name="proj")(y)

        for i in range(n_down):
            y = fill(y, L)
            z = ConvNorm(h.conv_channels, 3, stride=2, ns=h.ns, name=f"down_{i}")(y)
            if lengths is not None:
                L = (L + 1) // 2  # ceil: stride-2 VALID conv over reflect pad
            z = fill(z, L)
            z = ConvNorm(h.conv_channels, 3, ns=h.ns, name=f"res_{i}")(z)
            # strided residual: subsample the skip path to keep shapes static
            y = z + y[:, ::2, :]
            y = nn.Dropout(h.enc_dp, deterministic=not train)(y)

        y = nn.Dense(h.emb_size, name="dense")(y)
        y = nn.leaky_relu(y, h.ns)
        y = BiGRU(h.emb_size // 2, impl=self.gru_impl, name="rnn")(y, lengths=L)

        logits = nn.Dense(2 * h.emb_size, name="head")(y)
        b, t, _ = logits.shape
        return logits.reshape(b, t, h.emb_size, 2)
