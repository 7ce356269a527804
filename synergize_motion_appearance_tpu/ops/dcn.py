"""Deformable convolution v1/v2 — TPU-native equivalent of the reference's
CUDA extension (ops/dcn/src/deform_conv_cuda_kernel.cu:85-191).

The CUDA kernel's deformable_im2col = "bilinear-sample the input at
(base grid + kernel tap + learned offset), build columns, then GEMM".
That maps directly onto TPU: a batched bilinear gather (VPU/and XLA gather)
producing the (kh*kw, C) columns, then one einsum on the MXU. Backward
comes from JAX autodiff — the hand-written col2im/gradient kernels
(:262-376 of deform_conv_cuda.cpp) are unnecessary.

Offset layout matches torch DCN: offset (B, Ho, Wo, dg*kh*kw*2) with
(y, x) pairs per deformable-group-and-tap, mask (B, Ho, Wo, dg*kh*kw)
for the modulated (v2) variant.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .interp import _corner_plan_from_pixels, _pack_corners


def _bilinear_gather(x, ys, xs):
    """x: (B,H,W,C); ys/xs: (B,N) float sample positions.
    Returns (B,N,C) bilinear samples with zeros outside (matching
    deformable_im2col_bilinear's boundary handling).

    Corner-packed form (measured A/B vs the naive 4-gather form in
    tools/bench_dcn.py / docs/PERF.md §19): the 4 bilinear corners of
    every base pixel are packed into channels with rolls, the sample is
    ONE lane-aligned (N, 4C) gather, and the per-corner validity/wrap
    corrections are folded into 4 per-pixel slot weights — the same
    design as the grid_sample warp (ops/interp.py)."""
    B, H, W, C = x.shape
    flat, (a0, a1, a2, a3), _ = _corner_plan_from_pixels(
        xs.astype(jnp.float32), ys.astype(jnp.float32), H, W, "zeros")
    packed = _pack_corners(x)
    p = jnp.take_along_axis(packed.reshape(B, H * W, 4 * C),
                            flat[..., None], axis=1)
    bd = x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else None
    a0, a1, a2, a3 = (a[..., None] for a in (a0, a1, a2, a3))
    if bd is not None:
        a0, a1, a2, a3 = (a.astype(bd) for a in (a0, a1, a2, a3))
    out = (p[..., 0:C] * a0 + p[..., C:2 * C] * a1
           + p[..., 2 * C:3 * C] * a2 + p[..., 3 * C:] * a3)
    return out.astype(x.dtype)


def _bilinear_gather_naive(x, ys, xs):
    """Reference 4-separate-gathers form — numerics oracle for the
    packed form and the A/B baseline in tools/bench_dcn.py."""
    B, H, W, C = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def gather(yi, xi):
        valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = (yc * W + xc)
        out = jnp.take_along_axis(
            x.reshape(B, H * W, C), flat[..., None], axis=1
        )
        return out * valid[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None]
            + v10 * (wy1 * wx0)[..., None] + v11 * (wy1 * wx1)[..., None])


def deform_conv2d(x, offset, weight, bias=None, stride=(1, 1),
                  padding=(0, 0), dilation=(1, 1), groups: int = 1,
                  deformable_groups: int = 1, mask=None):
    """x: (B,H,W,Cin); offset: (B,Ho,Wo,dg*kh*kw*2);
    weight: (kh,kw,Cin//groups,Cout); mask (v2): (B,Ho,Wo,dg*kh*kw).
    Returns (B,Ho,Wo,Cout)."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    Ho = (H + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    Wo = (W + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    dg = deformable_groups
    cpg = Cin // dg  # channels per deformable group

    # base sampling grid per output position and tap, input coordinates
    oy = jnp.arange(Ho) * sh - ph
    ox = jnp.arange(Wo) * sw - pw
    ky = jnp.arange(kh) * dh
    kx = jnp.arange(kw) * dw
    base_y = oy[:, None, None, None] + ky[None, None, :, None]  # Ho,1,kh,1
    base_x = ox[None, :, None, None] + kx[None, None, None, :]  # 1,Wo,1,kw
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, kh, kw)).astype(jnp.float32)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, kh, kw)).astype(jnp.float32)

    off = offset.reshape(B, Ho, Wo, dg, kh, kw, 2)
    ys = base_y[None, :, :, None] + off[..., 0]  # (B,Ho,Wo,dg,kh,kw)
    xs = base_x[None, :, :, None] + off[..., 1]

    cols = []
    for g in range(dg):
        xg = x[..., g * cpg:(g + 1) * cpg]
        samp = _bilinear_gather(
            xg,
            ys[:, :, :, g].reshape(B, -1),
            xs[:, :, :, g].reshape(B, -1),
        ).reshape(B, Ho, Wo, kh, kw, cpg)
        if mask is not None:
            m = mask.reshape(B, Ho, Wo, dg, kh, kw)[:, :, :, g]
            samp = samp * m[..., None]
        cols.append(samp)
    cols = jnp.concatenate(cols, axis=-1)  # (B,Ho,Wo,kh,kw,Cin)

    if groups == 1:
        out = jnp.einsum("bhwyxc,yxco->bhwo", cols, weight)
    else:
        cg = Cin // groups
        og = Cout // groups
        outs = []
        for g in range(groups):
            outs.append(jnp.einsum(
                "bhwyxc,yxco->bhwo",
                cols[..., g * cg:(g + 1) * cg],
                weight[..., g * og:(g + 1) * og],
            ))
        out = jnp.concatenate(outs, axis=-1)
    if bias is not None:
        out = out + bias
    return out


def modulated_deform_conv2d(x, offset, mask, weight, bias=None,
                            stride=(1, 1), padding=(0, 0), dilation=(1, 1),
                            groups: int = 1, deformable_groups: int = 1):
    """DCNv2 (modulated): sigmoid mask scales each sampled tap
    (ops/dcn/deform_conv.py:223-377)."""
    return deform_conv2d(x, offset, weight, bias, stride, padding,
                         dilation, groups, deformable_groups, mask=mask)
