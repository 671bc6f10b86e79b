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
                jnp.dot(hprev.astype(w_dt), wh_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
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


# ---------------------------------------------------------------------------
# Differentiable wrapper: custom VJP with a Pallas BACKWARD kernel, so the
# TRAINING path (solver steps differentiate through encoder BiGRU + decoder
# GRU) gets the whole-recurrence kernel too, not just conversion.
#
# Backward math (reverse-time recurrence; recompute r/z/n from the saved
# forward outputs instead of stashing per-step activations):
#
#   hw     = h_{t-1} @ wh + bh
#   r,z    = sig(xw_r + hw_r), sig(xw_z + hw_z);  n = tanh(xw_n + r hw_n)
#   dh_t  += dys_t                      (carry from t+1 starts at 0)
#   dn^    = dh (1-z) (1-n^2)           (pre-activation n grad)
#   dz^    = dh (h_{t-1}-n) z (1-z)
#   dr^    = dn^ hw_n r (1-r)
#   dxw_t  = [dr^, dz^, dn^]
#   dhw    = [dr^, dz^, dn^ r]
#   dh_{t-1} = dh z + dhw @ wh^T
#   dwh   += h_{t-1}^T @ dhw;   dbh += sum_B dhw
#
# The grid walks time blocks BACK-TO-FRONT (index map G-1-i); dh is an f32
# VMEM scratch carried across grid steps; dwh/dbh accumulate directly in
# their (constant-index-map) output blocks, zeroed at grid step 0. h_{t-1}
# slabs are ys shifted right by one step (materialized outside — a block
# cannot read its left neighbour's last row).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("t_block", "interpret"))
def _gru_bwd_call(xw, wh, bh, ys, dys, *, t_block: int = 8, interpret: bool | None = None):
    """Backward pass of the unmasked forward-time scan.

    Returns (dxw [B,T,3H], dwh f32 [H,3H], dbh f32 [3H]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, h3 = xw.shape
    h = h3 // 3
    # xw + dxw (3H each) + hprev + dys (H each): 8H f32-equivalent per row
    tb = _pick_t_block(t, t_block, row_bytes=b * 8 * h * 4)
    grid = t // tb
    w_dt = wh.dtype

    hprev = jnp.concatenate(
        [jnp.zeros((b, 1, h), ys.dtype), ys[:, :-1, :]], axis=1
    )
    xw_tm = jnp.swapaxes(xw, 0, 1)  # [T, B, 3H]
    hprev_tm = jnp.swapaxes(hprev, 0, 1)
    dys_tm = jnp.swapaxes(dys, 0, 1)
    bh2 = bh.reshape(1, h3).astype(jnp.float32)
    whT = jnp.swapaxes(wh, 0, 1)  # [3H, H]

    def kernel(xw_ref, wh_ref, whT_ref, bh_ref, hp_ref, dy_ref,
               dxw_ref, dwh_ref, dbh_ref, dh_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dh_ref[:] = jnp.zeros_like(dh_ref)
            dwh_ref[:] = jnp.zeros_like(dwh_ref)
            dbh_ref[:] = jnp.zeros_like(dbh_ref)

        for ti in range(tb - 1, -1, -1):
            hprev_t = hp_ref[ti].astype(jnp.float32)
            hw = (
                jnp.dot(hp_ref[ti].astype(w_dt), wh_ref[:],
                        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
                + bh_ref[:]
            )
            xw_t = xw_ref[ti].astype(jnp.float32)
            r = jax.nn.sigmoid(xw_t[:, :h] + hw[:, :h])
            z = jax.nn.sigmoid(xw_t[:, h : 2 * h] + hw[:, h : 2 * h])
            n = jnp.tanh(xw_t[:, 2 * h :] + r * hw[:, 2 * h :])

            dh = dh_ref[:] + dy_ref[ti].astype(jnp.float32)
            dn_pre = dh * (1.0 - z) * (1.0 - n * n)
            dz_pre = dh * (hprev_t - n) * z * (1.0 - z)
            dr_pre = dn_pre * hw[:, 2 * h :] * r * (1.0 - r)
            dxw_t = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
            dhw = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=1)

            dxw_ref[ti] = dxw_t.astype(dxw_ref.dtype)
            dh_ref[:] = dh * z + jnp.dot(
                dhw.astype(w_dt), whT_ref[:], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
            )
            # h_{t-1}^T @ dhw without a vector transpose: contract the
            # batch axis of both operands
            dwh_ref[:] += jax.lax.dot_general(
                hprev_t.astype(w_dt), dhw.astype(w_dt),
                ((( 0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
            )
            dbh_ref[:] += jnp.sum(dhw, axis=0, keepdims=True)

    rev = lambda i: (grid - 1 - i, 0, 0)  # noqa: E731
    dxw_tm, dwh, dbh2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tb, b, h3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h3, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, h), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, h3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h3), xw.dtype),
            jax.ShapeDtypeStruct((h, h3), jnp.float32),
            jax.ShapeDtypeStruct((1, h3), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
    )(xw_tm, wh, whT, bh2, hprev_tm, dys_tm)

    return jnp.swapaxes(dxw_tm, 0, 1), dwh, dbh2.reshape(h3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gru_scan_diff(reverse: bool, xw, wh, bh):
    """Differentiable whole-recurrence GRU scan (unmasked).

    Same forward as ``pallas_gru_scan(..., lengths=None)``; gradients run
    through the Pallas backward kernel above. Used by models.layers.GRU so
    the solver's train steps keep the kernel (masked conversion buckets
    stay on the non-diff path — they are never differentiated).
    """
    return pallas_gru_scan(xw, wh, bh, None, reverse=reverse)


def _gru_diff_fwd(reverse, xw, wh, bh):
    ys = pallas_gru_scan(xw, wh, bh, None, reverse=reverse)
    return ys, (xw, wh, bh, ys)


def _gru_diff_bwd(reverse, res, dys):
    xw, wh, bh, ys = res
    if reverse:
        # forward ran scan_fwd on flip(xw) then flipped the outputs back:
        # conjugate the backward by the same flips
        xw, ys, dys = (jnp.flip(a, axis=1) for a in (xw, ys, dys))
    dxw, dwh, dbh = _gru_bwd_call(xw, wh, bh, ys, dys)
    if reverse:
        dxw = jnp.flip(dxw, axis=1)
    return dxw, dwh.astype(wh.dtype), dbh.astype(bh.dtype)


gru_scan_diff.defvjp(_gru_diff_fwd, _gru_diff_bwd)
