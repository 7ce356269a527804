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


def _bilinear_gather(x, ys, xs):
    """x: (B,H,W,C); ys/xs: (B,N) float sample positions.
    Returns (B,N,C) bilinear samples with zeros outside (matching
    deformable_im2col_bilinear's boundary handling)."""
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
