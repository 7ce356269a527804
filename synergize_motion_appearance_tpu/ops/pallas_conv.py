"""Pallas 3x3 stride-1 conv — row-blocked, MXU 9-tap matmul schedule.

Why: XLA's NHWC conv emitter is 4.5-14x off the IO roofline at the
decoder's hot shapes on v5e (measured, tools/bench_conv3x3.py /
docs/PERF.md), and matmul re-expressions at the XLA level (im2col,
tap-sum) lose even harder to patch-materialization HBM traffic. This
kernel keeps all patch handling in VMEM:

  grid = (B, H / block_rows); each program
    1. DMAs its row block + 1-row halos straight from HBM into a VMEM
       scratch whose columns are left-padded by 16 so every DMA
       destination offset is sublane-tile aligned (bf16 tile = (16, 128);
       unaligned DMA dst slices fail to lower in Mosaic — measured).
       Edge programs skip the missing halo via three static-shape DMAs
       under pl.when (DMA shapes must be static).
    2. runs 9 shifted (BR*W, C) x (C, Cout) MXU dots accumulated into an
       f32 scratch (at C=128 each dot fills the 128x128 systolic array
       exactly; no im2col buffer ever exists). The +-1 column taps are
       VALUE loads at unaligned sublane offsets (vector shifts — legal,
       unlike unaligned DMA stores).
    3. adds bias and writes the bf16 row block.

Numerically identical to lax.conv(pad=1): f32 accumulation over the same
9-tap contraction. Reference counterpart: plain nn.Conv2d in the VQGAN
generator blocks (vqgan_arch.py:168-191) — execution strategy only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 16  # left column pad: sublane-tile alignment for bf16 DMA dsts


def _conv_kernel(x_hbm, w_ref, b_ref, o_ref, xb, acc, sem, *,
                 block_rows, H, W, C):
    b = pl.program_id(0)
    i = pl.program_id(1)
    BR = block_rows
    r0 = i * BR
    nblocks = H // BR

    # zero the pad columns once per program: [0, _PAD) and [_PAD+W, +16)
    xb[:, 0:_PAD, :] = jnp.zeros((BR + 2, _PAD, C), xb.dtype)
    xb[:, _PAD + W:_PAD + W + 16, :] = jnp.zeros((BR + 2, 16, C), xb.dtype)

    # ---- load rows [r0-1, r0+BR+1) with zero halos at the image edges
    def copy(src_row, dst_row, nrows):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_row, nrows), :, :],
            xb.at[pl.ds(dst_row, nrows), pl.ds(_PAD, W), :], sem)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(i == 0, nblocks == 1))
    def _():
        xb[0, :, :] = jnp.zeros((_PAD + W + 16, C), xb.dtype)
        xb[BR + 1, :, :] = jnp.zeros((_PAD + W + 16, C), xb.dtype)
        copy(0, 1, BR)

    @pl.when(jnp.logical_and(i == 0, nblocks > 1))
    def _():
        xb[0, :, :] = jnp.zeros((_PAD + W + 16, C), xb.dtype)
        copy(0, 1, BR + 1)

    @pl.when(jnp.logical_and(i == nblocks - 1, nblocks > 1))
    def _():
        xb[BR + 1, :, :] = jnp.zeros((_PAD + W + 16, C), xb.dtype)
        copy(r0 - 1, 0, BR + 1)

    @pl.when(jnp.logical_and(i > 0, i < nblocks - 1))
    def _():
        copy(r0 - 1, 0, BR + 2)

    # ---- 9 shifted MXU dots, f32 accumulation
    Cout = o_ref.shape[-1]
    acc[:, :] = jnp.zeros((BR * W, Cout), jnp.float32)
    for di in range(3):
        for dj in range(3):
            c0 = _PAD - 1 + dj
            v = xb[di:di + BR, c0:c0 + W, :].reshape(BR * W, C)
            acc[:, :] += jax.lax.dot_general(
                v, w_ref[3 * di + dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out = acc[:, :] + b_ref[0].astype(jnp.float32)
    o_ref[0] = out.reshape(BR, W, Cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def conv3x3_pallas(x, w, b=None, block_rows: int = 32):
    """x: (B, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; pad=1, stride 1.
    H must be divisible by block_rows."""
    B, H, W, C = x.shape
    Cout = w.shape[-1]
    if H % block_rows:
        raise ValueError(f"H={H} not divisible by block_rows={block_rows}")
    if b is None:
        b = jnp.zeros((Cout,), x.dtype)
    w9 = w.astype(x.dtype).reshape(9, C, Cout)
    b2 = b.reshape(1, Cout)

    kernel = functools.partial(
        _conv_kernel, block_rows=block_rows, H=H, W=W, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B, H // block_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w9
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec((1, block_rows, W, Cout),
                               lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2, _PAD + W + 16, C), x.dtype),
            pltpu.VMEM((block_rows * W, Cout), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x, w9, b2)
