"""Pallas TPU kernel for the bilinear backward warp (grid_sample).

The north-star op (SURVEY.md section 2.2): XLA lowers the 4-corner gather
to a generic slow gather; this kernel keeps the source image in VMEM and
uses Mosaic's lane-aligned `tpu.dynamic_gather` (via take_along_axis over
a (H*W, C) view) — one in-register shuffle per corner instead of an HBM
gather loop.

Constraints (from the Mosaic gather lowering): indices must match the
source shape, so each program warps exactly H*W output positions against
the full (H*W, Cc) channel chunk — true for all warps in this model (the
deformation grid always has the feature's own resolution). Channel chunk
Cc is capped so img + transient index vectors fit VMEM at 256x256.

Semantics: align_corners=True, zeros padding — grid_sample parity for the
model's hot path (appmotioncodebook_arch.py:356). Other modes fall back to
the jnp implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interp import grid_sample as grid_sample_jnp


def _warp_kernel(h: int, w: int, cc: int, img_ref, grid_ref, out_ref):
    hw = h * w
    g = grid_ref[0]  # (HW, 2) f32
    ix = (g[:, 0:1] + 1.0) * (0.5 * (w - 1))  # (HW, 1)
    iy = (g[:, 1:2] + 1.0) * (0.5 * (h - 1))
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = ix - x0
    wy1 = iy - y0

    # Mosaic's dynamic_gather needs value/index bitwidths to match —
    # gather in f32 with i32 indices
    img = img_ref[0].astype(jnp.float32)  # (HW, Cc)
    acc = jnp.zeros((hw, cc), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xx = x0 + dx
            yy = y0 + dy
            valid = ((xx >= 0) & (xx <= w - 1)
                     & (yy >= 0) & (yy <= h - 1))  # (HW, 1)
            xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            flat = yi * w + xi  # (HW, 1)
            idx = jnp.broadcast_to(flat, (hw, cc))
            v = jnp.take_along_axis(img, idx, axis=0)  # dynamic_gather
            wgt = ((wy1 if dy else 1.0 - wy1)
                   * (wx1 if dx else 1.0 - wx1))
            wgt = jnp.where(valid, wgt, 0.0)
            acc = acc + v * wgt
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_warp_same_size(img, grid, interpret=False):
    """img: (B, H, W, C); grid: (Bg, H, W, 2) with B in {1, Bg}."""
    B, H, W, C = img.shape
    Bg = grid.shape[0]
    HW = H * W
    # channel chunk: keep img chunk + index vectors + accumulator in VMEM
    if HW >= 256 * 256:
        cc = 16
    elif HW >= 128 * 128:
        cc = 64
    else:
        cc = 128
    cc = min(cc, C)
    if C % cc != 0:
        cc = C  # odd channel counts: single chunk (small models/tests)

    img_flat = img.reshape(B, HW, C)
    grid_flat = grid.reshape(Bg, HW, 2)

    kernel = functools.partial(_warp_kernel, H, W, cc)

    def call_chunk(img_chunk):
        # last block dim == full chunk dim, per the Mosaic constraint
        return pl.pallas_call(
            kernel,
            grid=(Bg,),
            in_specs=[
                pl.BlockSpec((1, HW, cc),
                             (lambda b: (0, 0, 0)) if B == 1
                             else (lambda b: (b, 0, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HW, 2), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, HW, cc), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bg, HW, cc), img.dtype),
            interpret=interpret,
        )(img_chunk, grid_flat)

    if cc == C:
        out = call_chunk(img_flat)
    else:
        out = jnp.concatenate(
            [call_chunk(img_flat[..., k * cc:(k + 1) * cc])
             for k in range(C // cc)],
            axis=-1,
        )
    return out.reshape(Bg, H, W, C)


def grid_sample_pallas(img, grid, align_corners=True, padding_mode="zeros",
                       interpret=False):
    """Pallas-accelerated grid_sample; falls back to the jnp version when
    the mode/shape is outside the kernel's envelope."""
    B, H, W, C = img.shape
    Bg, Hg, Wg, _ = grid.shape
    same_size = (H, W) == (Hg, Wg)
    if (align_corners and padding_mode == "zeros" and same_size
            and B in (1, Bg)):
        return _pallas_warp_same_size(img, grid, interpret=interpret)
    return grid_sample_jnp(img, grid, align_corners, padding_mode)
