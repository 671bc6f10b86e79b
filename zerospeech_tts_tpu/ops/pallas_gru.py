"""Pallas kernel: whole-sequence GRU scan with VMEM-resident weights.

The conversion program's serial bottleneck (VERDICT r3 ask 1) is the two
GRU recurrences — the decoder's at the full frame rate (T=512 steps for a
6.4 s utterance) and the encoder's BiGRU at the latent rate (T=64 x 2
directions). The XLA `lax.scan` lowering re-stages the loop around every
step: each iteration is a tiny [B, H] x [H, 3H] matmul plus gate
elementwise work, and the while-loop body's fixed overhead (buffer
rotation, loop bookkeeping) dwarfs the ~1 us of MXU work per step.

This kernel runs the ENTIRE recurrence in one `pallas_call`:

- the recurrent weight `wh` [H, 3H] and bias live in VMEM for the whole
  sequence (the constant-index BlockSpec is fetched once, not per step);
- the hidden state is an f32 VMEM scratch accumulator carried across the
  sequential grid (TPU grid steps execute in order on one core, scratch
  persists), so bf16 runs get f32 state for free;
- time is blocked: grid step i DMAs a [t_block, B, 3H] slab of the
  precomputed input projections (time-major, so slabs are contiguous)
  while the previous slab computes, and an in-kernel `fori_loop` does
  the t_block serial steps back-to-back with zero loop re-staging;
- the reversed/masked variant (encoder backward direction over padded
  length-bucketed batches) folds the validity test `pos < lengths[b]`
  into the step as a `where` on the state update — identical semantics
  to the masked `lax.scan` in models/layers.py.

The input projections xw = x @ Wi + bi for ALL timesteps stay outside
(one large MXU matmul — already hoisted by models.layers.GRU); only the
irreducibly serial half lives here.

Cell math (matches models/layers.py GRU.cell, ref model.py GRU per
SURVEY.md §2 "NN building blocks"):

    hw = h @ wh + bh;   r = sig(xr + hw_r);  z = sig(xz + hw_z)
    n  = tanh(xn + r * hw_n);                h' = (1 - z) n + z h

Numerics: state and gates are f32; the per-step matmul runs at the dtype
of `wh` (bf16 inputs, f32 accumulation in bf16 mode). In f32 this is the
same arithmetic as the scan up to matmul reassociation; in bf16 it is
slightly MORE accurate than the scan (which carries bf16 state). It is
therefore NOT bit-identical to the scan path — the Converter keeps the
scan encoder for the challenge-exact all-f32 config and uses this kernel
where only audio (decoder) or the fast bf16 path is affected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = {jnp.dtype(jnp.float32): 8, jnp.dtype(jnp.bfloat16): 16}


def pallas_gru_supported(b: int, t: int, h: int, dtype) -> bool:
    """Shapes the kernel handles: lane-aligned H, sublane-aligned batch,
    and a time axis the block size can tile."""
    sub = _SUBLANE.get(jnp.dtype(dtype))
    if sub is None:
        return False
    return h % 128 == 0 and b % sub == 0 and b >= sub and t >= 1


_SLAB_BUDGET = 4 * 1024 * 1024  # max bytes for one [t_block, B, 3H] input slab


def _pick_t_block(t: int, want: int, row_bytes: int = 0) -> int:
    """Largest divisor of t that is <= want and whose slab fits the VMEM
    budget (double-buffered by the pipeline)."""
    if row_bytes:
        want = min(want, max(1, _SLAB_BUDGET // row_bytes))
    tb = max(1, min(want, t))
    while t % tb:
        tb -= 1
    return tb


@functools.partial(
    jax.jit, static_argnames=("reverse", "t_block", "interpret")
)
def pallas_gru_scan(
    xw: jnp.ndarray,  # [B, T, 3H] precomputed input projections (+ input bias)
    wh: jnp.ndarray,  # [H, 3H] recurrent weights
    bh: jnp.ndarray,  # [3H] recurrent bias
    lengths: jnp.ndarray | None = None,  # [B] true step counts (reverse mask)
    *,
    reverse: bool = False,
    t_block: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Run the full GRU recurrence in one kernel. Returns ys [B, T, H].

    ``reverse`` scans the sequence back-to-front (output in original time
    order); with ``lengths`` the reversed state passes through pad steps
    unchanged so each row's first REAL step sees h0 — exactly the masked
    scan in models/layers.py (padding-invariant bucketed encoding).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if lengths is not None and not reverse:
        raise NotImplementedError(
            "masked pallas_gru_scan implements the REVERSED padded-bucket "
            "semantics only (mask positions are computed right-to-left); "
            "forward scans over padded buckets don't need masking — pad "
            "steps trail the true tail and their outputs are discarded."
        )
    b, t, h3 = xw.shape
    h = h3 // 3
    assert wh.shape == (h, h3) and bh.shape == (h3,), (xw.shape, wh.shape, bh.shape)
    assert pallas_gru_supported(b, t, h, xw.dtype), (b, t, h, xw.dtype)
    tb = _pick_t_block(t, t_block, row_bytes=b * h3 * xw.dtype.itemsize)
    grid = t // tb
    masked = lengths is not None
    if reverse:
        xw = jnp.flip(xw, axis=1)

    xw_tm = jnp.swapaxes(xw, 0, 1)  # [T, B, 3H]: contiguous time slabs
    bh2 = bh.reshape(1, h3).astype(jnp.float32)
    w_dt = wh.dtype

    def kernel(*refs):
        if masked:
            xw_ref, wh_ref, bh_ref, len_ref, ys_ref, h_ref = refs
        else:
            xw_ref, wh_ref, bh_ref, ys_ref, h_ref = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)

        # STATIC unroll over the block's timesteps: all xw/ys indices are
        # compile-time constants. (A fori_loop with dynamic leading-dim
        # indexing lowered to pathological Mosaic code: 4-minute compiles
        # and ~50 us/step. Static indices into the pipelined VMEM slab
        # keep each step at matmul + VPU-gate cost.)
        for ti in range(tb):
            hprev = h_ref[:]
            hw = (
                jnp.dot(hprev.astype(w_dt), wh_ref[:], preferred_element_type=jnp.float32)
                + bh_ref[:]
            )
            xw_t = xw_ref[ti].astype(jnp.float32)
            r = jax.nn.sigmoid(xw_t[:, :h] + hw[:, :h])
            z = jax.nn.sigmoid(xw_t[:, h : 2 * h] + hw[:, h : 2 * h])
            n = jnp.tanh(xw_t[:, 2 * h :] + r * hw[:, 2 * h :])
            hnew = (1.0 - z) * n + z * hprev
            if masked:
                # reversed global position of this step in the ORIGINAL
                # order; lengths are laid out [B, 1] so the row mask
                # broadcasts over lanes with no vector transpose (Mosaic
                # cannot legalize a transpose of an i1 vector)
                pos = t - 1 - (i * tb + ti)
                valid = pos < len_ref[:]  # [B, 1]
                hnew = jnp.where(valid, hnew, hprev)
            h_ref[:] = hnew
            ys_ref[ti] = hnew.astype(ys_ref.dtype)

    in_specs = [
        pl.BlockSpec((tb, b, h3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xw_tm, wh, bh2]
    if masked:
        in_specs.append(
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(lengths, jnp.int32).reshape(b, 1))

    ys = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, b, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, h), xw.dtype),
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
    )(*args)

    ys = jnp.swapaxes(ys, 0, 1)  # [B, T, H]
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys
