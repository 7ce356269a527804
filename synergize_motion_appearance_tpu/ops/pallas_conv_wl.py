"""W-in-lanes Pallas 3x3 conv — the shuffle-free layout from PERF.md §4.

The NHWC kernel (`pallas_conv.py`) loses to XLA's conv because 6 of its
9 taps load at unaligned SUBLANE offsets, each paying a full vreg
relayout (~0.6 ms of non-MXU work at 128²), and C=64 shapes fail to
lower at all. This kernel stores activations as (B, H, C, W) — W in
lanes, C in sublanes — which restructures the 9-tap schedule so no
sublane-offset load exists:

  * the three ROW taps (di = -1/0/+1) collapse into ONE contiguous
    (3C, W) VMEM slice: rows h-1,h,h+1 of the (rows, C, W) scratch are
    adjacent in the collapsed sublane dim, so the di-merge is a free
    reshape, not a shifted load;
  * the three COLUMN taps (dj) are ±1 LANE-offset slices of that same
    block — lane shifts, the cheap direction on the VPU;
  * each output row is one MXU matmul acc(Cout, W) += w_dj(Cout, 3C) @
    block[:, dj:dj+W] — 3 dots per row instead of 9, contraction K=3C
    (192 at C=64, 384 at C=128), f32 accumulation.

Weights are HWIO (3,3,Cin,Cout) rearranged once to (3, 3*Cin, Cout)
with the di-major ordering the collapsed block uses.

Numerics: identical 9-tap contraction as lax.conv(pad=1), f32
accumulation. Reference counterpart: nn.Conv2d in the decoder blocks
(vqgan_arch.py:168-191) — execution strategy only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LPAD = 128  # lane pad so halo-column DMA destinations stay tile-aligned


def _conv_wl_kernel(x_hbm, w_ref, b_ref, o_ref, xb, sem, *,
                    block_rows, H, W, C):
    b = pl.program_id(0)
    i = pl.program_id(1)
    BR = block_rows
    r0 = i * BR
    nblocks = H // BR
    Cout = o_ref.shape[2]

    # zero ONLY the two halo columns (lane _LPAD-1 and lane _LPAD+W);
    # the rest of the lane pad is never read by the dj slices, so
    # whatever garbage it holds is harmless — zeroing all 2*_LPAD pad
    # lanes per program would write more pad than payload at C=64
    xb[:, :, _LPAD - 1:_LPAD] = jnp.zeros((BR + 2, C, 1), xb.dtype)
    xb[:, :, _LPAD + W:_LPAD + W + 1] = jnp.zeros((BR + 2, C, 1), xb.dtype)

    def copy(src_row, dst_row, nrows):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_row, nrows), :, :],
            xb.at[pl.ds(dst_row, nrows), :, pl.ds(_LPAD, W)], sem)
        cp.start()
        cp.wait()

    # nblocks is static — gate the branch SET in Python so dead branches
    # (whose copies would slice past the image) are never traced
    if nblocks == 1:
        xb[0, :, _LPAD - 1:_LPAD + W + 1] = jnp.zeros((C, W + 2), xb.dtype)
        xb[BR + 1, :, _LPAD - 1:_LPAD + W + 1] = jnp.zeros((C, W + 2),
                                                           xb.dtype)
        copy(0, 1, BR)
    else:
        @pl.when(i == 0)
        def _():
            xb[0, :, _LPAD - 1:_LPAD + W + 1] = jnp.zeros((C, W + 2),
                                                          xb.dtype)
            copy(0, 1, BR + 1)

        @pl.when(i == nblocks - 1)
        def _():
            xb[BR + 1, :, _LPAD - 1:_LPAD + W + 1] = jnp.zeros(
                (C, W + 2), xb.dtype)
            copy(r0 - 1, 0, BR + 1)

        if nblocks > 2:
            @pl.when(jnp.logical_and(i > 0, i < nblocks - 1))
            def _():
                copy(r0 - 1, 0, BR + 2)

    # ---- per output row: 3 lane-shifted MXU dots over the merged
    # (3C, W) row-triple block, f32 accumulation
    xflat = xb[:, :, :]                       # (BR+2, C, Wp)
    Wp = 2 * _LPAD + W
    # accumulate in >= f32; follows the operand dtype upward so f64
    # interpret-mode runs (the numerics-verification path, CPU-only)
    # really accumulate in f64 instead of silently truncating to f32
    acc_t = jnp.promote_types(jnp.float32, o_ref.dtype)
    for h in range(BR):
        block = xflat[h:h + 3].reshape(3 * C, Wp)
        acc = jnp.zeros((Cout, W), acc_t)
        for dj in range(3):
            c0 = _LPAD - 1 + dj
            acc += jax.lax.dot_general(
                w_ref[dj], block[:, c0:c0 + W],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
        o_ref[0, h] = (acc + b_ref[:, 0:1].astype(acc_t)).astype(
            o_ref.dtype)


def pick_block_rows(H: int, W: int, C: int, Cout: int, itemsize: int):
    """Largest block_rows whose VMEM footprint stays inside the 16 MB
    scoped budget: halo'd input scratch (single-buffered) plus the
    pipelined (double-buffered) output block and weight/bias operands,
    with ~2.5 MB measured overhead (stack, semaphores, halo DMA
    staging) — 12.25 MB keeps the worst observed case at ~14.8 of the
    16 MB budget (PERF.md §15). Returns None if nothing fits."""
    def _fits(b):
        scratch = (b + 2) * C * (2 * _LPAD + W) * itemsize
        outb = b * Cout * W * itemsize
        wts = 3 * Cout * 3 * C * itemsize
        return scratch + 2 * (outb + wts) < 12544 * 1024
    return next((b for b in (32, 16, 8, 4, 2, 1)
                 if H % b == 0 and _fits(b)), None)


@functools.partial(jax.jit,
                   static_argnames=("block_rows", "interpret"))
def conv3x3_wl(x, w, b=None, block_rows: int = 8, interpret: bool = False):
    """x: (B, H, Cin, W) — W-in-lanes layout; w: (3, 3, Cin, Cout) HWIO;
    pad=1, stride 1. Returns (B, H, Cout, W). H % block_rows == 0."""
    B, H, C, W = x.shape
    Cout = w.shape[-1]
    if H % block_rows:
        raise ValueError(f"H={H} not divisible by block_rows={block_rows}")
    if b is None:
        b = jnp.zeros((Cout,), x.dtype)
    # (3, 3, Cin, Cout) -> per-dj (Cout, 3Cin) with di-major row order
    # matching the collapsed (row-triple, C) block
    w3 = jnp.transpose(w.astype(x.dtype), (1, 3, 0, 2))  # (dj, Cout, di, C)
    w3 = w3.reshape(3, Cout, 3 * C)
    b2 = b.reshape(Cout, 1)

    kernel = functools.partial(
        _conv_wl_kernel, block_rows=block_rows, H=H, W=W, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B, H // block_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec((1, block_rows, Cout, W),
                               lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Cout, W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2, C, 2 * _LPAD + W), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, w3, b2)


# ---------------------------------------------------------------------
# Differentiable wrapper — lets the WL layout run inside the TRAIN graph
# (the raw pallas_call has no autodiff rule). The input gradient of a
# stride-1/pad-1 3x3 conv is the SAME conv applied to the cotangent with
# 180°-rotated, IO-transposed weights, so dgrad reuses the shuffle-free
# kernel; the weight gradient is 9 lane-shifted MXU contractions over
# (B·H·W) in f32 (XLA); the bias gradient is a sum. Reference
# counterpart: torch autograd of nn.Conv2d in the decoder blocks
# (vqgan_arch.py:168-191) — execution strategy only.
# ---------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def conv3x3_wl_ad(block_rows, interpret, x, w, b):
    return conv3x3_wl(x, w, b, block_rows=block_rows, interpret=interpret)


def _wl_ad_fwd(block_rows, interpret, x, w, b):
    y = conv3x3_wl(x, w, b, block_rows=block_rows, interpret=interpret)
    return y, (x, w)


def _wl_ad_bwd(block_rows, interpret, res, dy):
    x, w = res
    B, H, C, W = x.shape
    Cout = w.shape[-1]
    # dgrad: conv3x3_wl(dy, rot180(w)^T); block_rows re-picked for the
    # (Cout -> C) shape (the fwd choice optimized Cin -> Cout)
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # (3,3,Cout,Cin)
    br = pick_block_rows(H, W, Cout, C, dy.dtype.itemsize) or block_rows
    dx = conv3x3_wl(dy, w_flip, None, block_rows=br, interpret=interpret)

    # wgrad: dw[di,dj,ci,co] = sum_{b,h,w} xpad[b,h+di,ci,w+dj]·dy[b,h,co,w]
    acc_t = jnp.promote_types(jnp.float32, x.dtype)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)))
    taps = []
    for di in range(3):
        row = []
        for dj in range(3):
            xs = jax.lax.dynamic_slice(
                xpad, (0, di, 0, dj), (B, H, C, W))
            row.append(jnp.einsum("bhcw,bhow->co", xs, dy,
                                  preferred_element_type=acc_t))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)  # (3,3,Cin,Cout)

    db = jnp.sum(dy, axis=(0, 1, 3),
                 dtype=acc_t).astype(dy.dtype)
    return dx, dw, db


conv3x3_wl_ad.defvjp(_wl_ad_fwd, _wl_ad_bwd)
