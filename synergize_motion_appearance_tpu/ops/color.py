"""Device-side RGB <-> YUV420 (I420) conversion, BT.601 studio swing.

Rationale: the host<->device link is the reenactment pipeline's usual
bottleneck (see bench.py). Video decoders emit and encoders consume
YUV 4:2:0 natively, so moving frames across the link as packed I420
(1.5 bytes/pixel) instead of RGB (3 bytes/pixel) halves transfer bytes
with zero extra loss in the video path. The conversion itself is an
affine map + stride-2 subsample — a few fused elementwise ops on TPU.

Coefficient contract: matches OpenCV's COLOR_RGB2YUV_I420 /
COLOR_YUV2RGB_I420 pair (ITU-R BT.601, studio swing: Y in [16,235],
U/V in [16,240]; chroma = top-left sample of each 2x2 block, which is
what cv2 uses — verified empirically in tests/test_color_ops.py), so a
device-produced I420 frame converts back on host with cv2 bit-closely.

I420 packing: (H*3/2, W) uint8 per frame — rows [0,H): Y plane; rows
[H, H+H/4): U plane (H/2 x W/2, row-major reflowed to W columns); rows
[H+H/4, H*3/2): V plane likewise.
"""
from __future__ import annotations

import jax.numpy as jnp

# BT.601 studio-swing forward coefficients (x256)
_YR, _YG, _YB = 65.738, 129.057, 25.064
_UR, _UG, _UB = -37.945, -74.494, 112.439
_VR, _VG, _VB = 112.439, -94.154, -18.285


def rgb_to_yuv420(rgb, model_domain: bool = True):
    """rgb: (F, H, W, 3) float in [-1, 1] (model domain) or uint8.
    Returns packed I420 uint8 of shape (F, H*3/2, W)."""
    F, H, W, _ = rgb.shape
    # H % 4: the U/V planes ((F, H/2, W/2)) are reflowed to (F, H/4, W)
    # rows below, which needs H/2 even
    assert H % 4 == 0 and W % 2 == 0, \
        "I420 packing needs H % 4 == 0 and even W"
    if rgb.dtype == jnp.uint8:
        x = rgb.astype(jnp.float32)
    elif model_domain:
        x = (jnp.clip(rgb.astype(jnp.float32), -1.0, 1.0) + 1.0) * 127.5
    else:
        x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 16.0 + (_YR * r + _YG * g + _YB * b) * (1.0 / 256.0)
    # chroma from the top-left pixel of each 2x2 block (cv2 convention)
    rs, gs, bs = r[:, ::2, ::2], g[:, ::2, ::2], b[:, ::2, ::2]
    u = 128.0 + (_UR * rs + _UG * gs + _UB * bs) * (1.0 / 256.0)
    v = 128.0 + (_VR * rs + _VG * gs + _VB * bs) * (1.0 / 256.0)

    def q(p):
        return jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.uint8)

    yp = q(y)                                   # (F, H, W)
    up = q(u).reshape(F, H // 4, W)             # (F, H/2, W/2) -> reflow
    vp = q(v).reshape(F, H // 4, W)
    return jnp.concatenate([yp, up, vp], axis=1)


def yuv420_to_rgb(yuv, model_domain: bool = True):
    """yuv: (F, H*3/2, W) packed I420 uint8 (or float carrying the same
    values). Returns (F, H, W, 3): float [-1, 1] when model_domain,
    else float [0, 255]. Chroma is nearest-upsampled (cv2 convention)."""
    F, H15, W = yuv.shape
    H = (H15 * 2) // 3
    x = yuv.astype(jnp.float32)
    y = x[:, :H]
    u = x[:, H:H + H // 4].reshape(F, H // 2, W // 2)
    v = x[:, H + H // 4:].reshape(F, H // 2, W // 2)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    c = 1.164383 * (y - 16.0)
    d = u - 128.0
    e = v - 128.0
    r = c + 1.596027 * e
    g = c - 0.391762 * d - 0.812968 * e
    b = c + 2.017232 * d
    rgb = jnp.stack([r, g, b], axis=-1)
    rgb = jnp.clip(rgb, 0.0, 255.0)
    if model_domain:
        return rgb * (2.0 / 255.0) - 1.0
    return rgb
