"""NN building blocks (ref model.py:~10-90: conv_bank, pad_layer,
pixel_shuffle_1d, upsample, GRU wrappers, append_emb).

TPU notes: 1-D convs are expressed as flax Conv over the time axis in
[B, T, C] layout, which XLA lowers to MXU matmuls; reflect padding is done
explicitly (the reference's pad_layer) so conv kernels stay VALID/SAME-free
and shape arithmetic is static.
"""

from __future__ import annotations

import flax.linen as nn
import jax
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


class GRU(nn.Module):
    """GRU over time, restructured for the TPU (standard GRU math, but NOT
    flax's per-step cell): the input-to-hidden projections for ALL
    timesteps are hoisted out of the recurrence into one large MXU matmul
    [B*T, in] x [in, 3H]; the lax.scan body keeps only the small recurrent
    matmul [B, H] x [H, 3H] + elementwise gates, unrolled x4 to amortize
    scan overhead. Halves the serial FLOPs and moves the rest to
    MXU-efficient shapes — the dominant win for conversion latency.
    """

    hidden: int
    reverse: bool = False
    unroll: int = 4

    @nn.compact
    def __call__(self, x):
        h = self.hidden
        b, t, _ = x.shape
        # input projections for r, z, n gates in one shot
        xw = nn.Dense(3 * h, name="wi")(x)  # [B, T, 3H]
        wh = self.param("wh", nn.initializers.orthogonal(), (h, 3 * h))
        bh = self.param("bh", nn.initializers.zeros, (3 * h,))

        if self.reverse:
            xw = jnp.flip(xw, axis=1)

        def step(hprev, xw_t):
            hw = hprev @ wh + bh
            xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hw, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            hnew = (1.0 - z) * n + z * hprev
            return hnew, hnew

        h0 = jnp.zeros((b, h), x.dtype)
        _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xw, 0, 1), unroll=self.unroll)
        ys = jnp.swapaxes(ys, 0, 1)  # [B, T, H]
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class BiGRU(nn.Module):
    """Bidirectional GRU (forward + reversed GRU, concatenated)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        return jnp.concatenate(
            [GRU(self.hidden, name="fwd")(x), GRU(self.hidden, reverse=True, name="bwd")(x)],
            axis=-1,
        )
