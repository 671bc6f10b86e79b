"""NN building blocks (ref model.py:~10-90: conv_bank, pad_layer,
pixel_shuffle_1d, upsample, GRU wrappers, append_emb).

TPU notes: 1-D convs are expressed as flax Conv over the time axis in
[B, T, C] layout, which XLA lowers to MXU matmuls; reflect padding is done
explicitly (the reference's pad_layer) so conv kernels stay VALID/SAME-free
and shape arithmetic is static.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def reflect_pad_time(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Reflect-pad the time axis for an odd/even kernel (ref pad_layer)."""
    lpad = (kernel_size - 1) // 2
    rpad = kernel_size - 1 - lpad
    return jnp.pad(x, ((0, 0), (lpad, rpad), (0, 0)), mode="reflect")


def pixel_shuffle_1d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, T, C*r] -> [B, T*r, C] sub-pixel temporal upsample
    (ref pixel_shuffle_1d, the decoder's upsampling primitive)."""
    b, t, cr = x.shape
    assert cr % r == 0, (cr, r)
    c = cr // r
    return x.reshape(b, t, r, c).reshape(b, t * r, c)


def append_emb(x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
    """Broadcast-concat a per-utterance embedding onto every frame
    (ref append_emb: speaker conditioning at each decoder block)."""
    b, t, _ = x.shape
    tiled = jnp.broadcast_to(emb[:, None, :], (b, t, emb.shape[-1]))
    return jnp.concatenate([x, tiled], axis=-1)


class ConvNorm(nn.Module):
    """Reflect-padded 1-D conv + leaky-relu (the reference's conv+pad+act idiom)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    ns: float = 0.01
    use_act: bool = True

    @nn.compact
    def __call__(self, x):
        x = reflect_pad_time(x, self.kernel_size)
        x = nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,), padding="VALID")(x)
        if self.use_act:
            x = nn.leaky_relu(x, self.ns)
        return x


class ConvBank(nn.Module):
    """Conv bank with kernel sizes 1..bank_size, outputs concatenated with
    the input (ref conv_bank; Tacotron-CBHG-style multi-resolution front)."""

    bank_size: int = 8
    channels: int = 128
    ns: float = 0.01

    @nn.compact
    def __call__(self, x):
        outs = [
            ConvNorm(self.channels, k, ns=self.ns, name=f"bank_{k}")(x)
            for k in range(1, self.bank_size + 1)
        ]
        return jnp.concatenate(outs + [x], axis=-1)


class BiGRU(nn.Module):
    """Bidirectional GRU over time via lax.scan (flax RNN)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.GRUCell(self.hidden), name="fwd")
        bwd = nn.RNN(nn.GRUCell(self.hidden), name="bwd", reverse=True, keep_order=True)
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


class GRU(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        return nn.RNN(nn.GRUCell(self.hidden), name="gru")(x)
