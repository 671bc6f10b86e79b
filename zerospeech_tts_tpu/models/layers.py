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


def mirror_fill_time(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Replace rows at/after each row's true ``length`` with the
    edge-excluded reflection of its true rows (np.pad 'reflect' indices,
    exact at any fold depth).

    [B, T, C] + lengths [B] -> [B, T, C]. Convs over the result see, at
    every true row, exactly the context that reflect-padded exact-length
    processing would see — the key to padding-invariant encodings in
    length-bucketed batches (the reference converts batch-1 at exact
    length, ref convert.py per SURVEY.md §3.4)."""
    t = x.shape[1]
    L = jnp.maximum(jnp.asarray(lengths, jnp.int32)[:, None], 2)
    period = 2 * (L - 1)
    m = jnp.arange(t, dtype=jnp.int32)[None, :] % period
    j = jnp.minimum(m, period - m)
    return jnp.take_along_axis(x, j[:, :, None], axis=1)


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
    impl: str = "scan"  # "pallas": whole-recurrence kernel (ops/pallas_gru)

    @nn.compact
    def __call__(self, x, lengths=None):
        h = self.hidden
        b, t, _ = x.shape
        # input projections for r, z, n gates in one shot
        xw = nn.Dense(3 * h, name="wi")(x)  # [B, T, 3H]
        wh = self.param("wh", nn.initializers.orthogonal(), (h, 3 * h))
        bh = self.param("bh", nn.initializers.zeros, (3 * h,))

        if self.impl == "pallas":
            from zerospeech_tts_tpu.ops.pallas_gru import (
                gru_scan_diff,
                pallas_gru_scan,
                pallas_gru_supported,
            )

            if pallas_gru_supported(b, t, h, xw.dtype):
                if self.reverse and lengths is not None:
                    # masked reversed scan (padded conversion buckets):
                    # inference-only — never differentiated
                    return pallas_gru_scan(xw, wh, bh, lengths, reverse=True)
                # custom-VJP wrapper: train steps differentiate through
                # the kernel (Pallas backward kernel in ops/pallas_gru)
                return gru_scan_diff(self.reverse, xw, wh, bh)
            # unsupported shape (e.g. batch 1): fall through to the scan

        if self.reverse:
            xw = jnp.flip(xw, axis=1)

        def cell(hprev, xw_t):
            hw = hprev @ wh + bh
            xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hw, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            return (1.0 - z) * n + z * hprev

        # carry dtype must equal the cell OUTPUT dtype: with mixed
        # input/param dtypes (e.g. bf16 activations over f32 params) the
        # recurrent matmul promotes, and a carry pinned to x.dtype would
        # fail lax.scan's carry-type check.
        h0 = jnp.zeros((b, h), jnp.result_type(xw.dtype, wh.dtype))
        if self.reverse and lengths is not None:
            # padded buckets: a reversed scan would feed pad-row state into
            # every true row (unbounded receptive field). Pass h through
            # unchanged until each row's true tail, so the first REAL step
            # sees h0 exactly like an exact-length (batch-1 reference) run.
            pos = jnp.arange(t - 1, -1, -1, dtype=jnp.int32)  # position per scan step
            valid = pos[:, None] < jnp.asarray(lengths, jnp.int32)[None, :]  # [T, B]

            def step_masked(hprev, inp):
                xw_t, v = inp
                hnew = jnp.where(v[:, None], cell(hprev, xw_t), hprev)
                return hnew, hnew

            _, ys = jax.lax.scan(
                step_masked, h0, (jnp.swapaxes(xw, 0, 1), valid), unroll=self.unroll
            )
        else:

            def step(hprev, xw_t):
                hnew = cell(hprev, xw_t)
                return hnew, hnew

            _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xw, 0, 1), unroll=self.unroll)
        ys = jnp.swapaxes(ys, 0, 1)  # [B, T, H]
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class BiGRU(nn.Module):
    """Bidirectional GRU (forward + reversed GRU, concatenated).

    ``lengths`` (optional, [B] true row counts) masks the BACKWARD scan so
    bucket padding cannot leak into true rows; the forward scan needs no
    mask (padding follows the true rows)."""

    hidden: int
    impl: str = "scan"

    @nn.compact
    def __call__(self, x, lengths=None):
        return jnp.concatenate(
            [
                GRU(self.hidden, impl=self.impl, name="fwd")(x),
                GRU(self.hidden, reverse=True, impl=self.impl, name="bwd")(
                    x, lengths=lengths
                ),
            ],
            axis=-1,
        )
