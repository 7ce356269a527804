"""StyleGAN2 native-op equivalents: fused_leaky_relu, upfirdn2d.

Parity targets: ops/fused_act/fused_act.py:75-89 (fused bias + scaled
leaky-relu) and ops/upfirdn2d/upfirdn2d.py:147+ (upsample - FIR filter -
downsample). On TPU these are pure element-wise / conv ops that XLA fuses;
the CUDA extensions exist in the reference only because eager torch
wouldn't. Same op API for surface parity.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = 2 ** 0.5):
    """y = leaky_relu(x + bias) * scale, bias broadcast on channels (NHWC)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale


def upfirdn2d(x, kernel, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)):
    """x: (B,H,W,C); kernel: (kh,kw) FIR filter.
    upsample by zero-insertion, pad, correlate with kernel, downsample."""
    B, H, W, C = x.shape
    kh, kw = kernel.shape
    p0, p1 = pad

    if up > 1:
        z = jnp.zeros((B, H, up, W, up, C), x.dtype)
        z = z.at[:, :, 0, :, 0, :].set(x)
        x = z.reshape(B, H * up, W * up, C)
    x = jnp.pad(
        x,
        ((0, 0), (max(p0, 0), max(p1, 0)), (max(p0, 0), max(p1, 0)), (0, 0)),
    )
    if p0 < 0 or p1 < 0:
        x = x[:, max(-p0, 0): x.shape[1] - max(-p1, 0),
              max(-p0, 0): x.shape[2] - max(-p1, 0)]

    k = jnp.asarray(kernel, x.dtype)[::-1, ::-1][:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    if down > 1:
        x = x[:, ::down, ::down]
    return x


def make_resample_kernel(k: Sequence[int]):
    """1D -> normalized 2D FIR kernel (upfirdn2d.py make_kernel)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)
