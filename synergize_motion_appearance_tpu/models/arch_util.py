"""Architecture utilities — TPU-native port of the reference's
``basicsr/archs/arch_util.py`` public surface.

Parity targets (reference file:line):
  * ``default_init_weights`` (:18-45)  -> ``scaled_conv_kernel_init``
    (flax initializer expressing the same kaiming-then-scale recipe).
  * ``make_layer`` (:48-61)            -> ``make_layer`` (stack of blocks).
  * ``ResidualBlockNoBN`` (:64-92).
  * ``Upsample`` pixel-shuffle tower (:95-115).
  * ``flow_warp`` (:117-148)           -> pixel-unit optical-flow warp on
    top of ``ops.grid_sample`` (the reference calls ``F.grid_sample``).
  * ``resize_flow`` (:151-187).
  * ``DCNv2Pack`` (:209-236)           -> flax module over
    ``ops.dcn.modulated_deform_conv2d`` (offsets/mask predicted from a
    *separate* feature map, zero-initialised like the torch pack).
  * ``trunc_normal_`` (:239-301)       -> ``trunc_normal_init``.

All tensors NHWC; flows are (B, H, W, 2) in (x, y) pixel units to match
``flow_warp``'s contract (reference :127 stacks grid_x, grid_y).
"""
from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import grid_sample
from ..ops.interp import resize_bilinear, resize_nearest
from ..ops.dcn import modulated_deform_conv2d
from .layers import Conv2d, torch_conv_kernel_init
from .extended_blocks import pixel_shuffle


def scaled_conv_kernel_init(scale: float = 1.0):
    """``default_init_weights`` analog: kaiming-uniform (torch conv
    default, a=sqrt(5)) then multiply by ``scale`` (arch_util.py:18-45)."""

    def init(key, shape, dtype=jnp.float32):
        return torch_conv_kernel_init(key, shape, dtype) * scale

    return init


def trunc_normal_init(std: float = 1.0, mean: float = 0.0,
                      a: float = -2.0, b: float = 2.0):
    """timm-style truncated normal (arch_util.py:239-301): sample a normal
    truncated to [a, b] via the inverse-CDF method, then scale/shift."""

    def init(key, shape, dtype=jnp.float32):
        lo = 0.5 * (1.0 + math.erf(a / math.sqrt(2.0)))
        hi = 0.5 * (1.0 + math.erf(b / math.sqrt(2.0)))
        u = jax.random.uniform(key, shape, jnp.float32,
                               2 * lo - 1, 2 * hi - 1)
        x = jax.scipy.special.erfinv(u) * math.sqrt(2.0)
        x = jnp.clip(x, a, b)
        return (x * std + mean).astype(dtype)

    return init


class ResidualBlockNoBN(nn.Module):
    """Conv-ReLU-Conv residual block, convs init-scaled by 0.1 unless
    ``pytorch_init`` (arch_util.py:64-92)."""

    num_feat: int = 64
    res_scale: float = 1.0
    pytorch_init: bool = False

    @nn.compact
    def __call__(self, x):
        init = (torch_conv_kernel_init if self.pytorch_init
                else scaled_conv_kernel_init(0.1))
        out = Conv2d(self.num_feat, (3, 3), padding=1, kernel_init=init,
                     name="conv1")(x)
        out = nn.relu(out)
        out = Conv2d(self.num_feat, (3, 3), padding=1, kernel_init=init,
                     name="conv2")(out)
        return x + out * self.res_scale


class Upsample(nn.Module):
    """Pixel-shuffle upsample tower for scale 2^n or 3
    (arch_util.py:95-115)."""

    scale: int
    num_feat: int

    @nn.compact
    def __call__(self, x):
        s = self.scale
        if s & (s - 1) == 0:  # power of two
            for i in range(int(math.log2(s))):
                x = Conv2d(4 * self.num_feat, (3, 3), padding=1,
                           name=f"conv{i}")(x)
                x = pixel_shuffle(x, 2)
        elif s == 3:
            x = Conv2d(9 * self.num_feat, (3, 3), padding=1,
                       name="conv0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(
                f"scale {s} is not supported. Supported scales: 2^n and 3.")
        return x


def make_layer(block: Callable[..., nn.Module], num_blocks: int, **kwargs):
    """Stack ``num_blocks`` instances of ``block`` (arch_util.py:48-61).
    Returns a flax Module applying them sequentially."""

    class _Stack(nn.Module):

        @nn.compact
        def __call__(self, x, *args, **call_kwargs):
            for i in range(num_blocks):
                x = block(**kwargs, name=f"block{i}")(x, *args,
                                                      **call_kwargs)
            return x

    return _Stack()


def flow_warp(x, flow, interp_mode: str = "bilinear",
              padding_mode: str = "zeros", align_corners: bool = True):
    """Warp ``x`` (B,H,W,C) by pixel-unit optical flow (B,H,W,2) in
    (x, y) order (arch_util.py:117-148)."""
    B, H, W, C = x.shape
    assert flow.shape[1:3] == (H, W)
    grid_x = jnp.arange(W, dtype=flow.dtype)
    grid_y = jnp.arange(H, dtype=flow.dtype)
    gx = grid_x[None, None, :] + flow[..., 0]
    gy = grid_y[None, :, None] + flow[..., 1]
    # normalize to [-1, 1] (reference :142-144)
    gx = 2.0 * gx / max(W - 1, 1) - 1.0
    gy = 2.0 * gy / max(H - 1, 1) - 1.0
    vgrid = jnp.stack([gx, gy], axis=-1)
    if interp_mode == "nearest":
        # round-to-nearest sample: reuse bilinear gather on rounded grid
        if align_corners:
            gxp = jnp.round((gx + 1) * 0.5 * (W - 1))
            gyp = jnp.round((gy + 1) * 0.5 * (H - 1))
            vgrid = jnp.stack([gxp / max(W - 1, 1) * 2 - 1,
                               gyp / max(H - 1, 1) * 2 - 1], axis=-1)
        else:
            gxp = jnp.floor((gx + 1) * W * 0.5 - 0.5 + 0.5)
            gyp = jnp.floor((gy + 1) * H * 0.5 - 0.5 + 0.5)
            vgrid = jnp.stack([(2 * gxp + 1) / W - 1,
                               (2 * gyp + 1) / H - 1], axis=-1)
    return grid_sample(x, vgrid, align_corners=align_corners,
                       padding_mode=padding_mode)


def resize_flow(flow, size_type: str, sizes: Sequence,
                interp_mode: str = "bilinear",
                align_corners: bool = False):
    """Resize a flow field and rescale its values (arch_util.py:151-187).
    flow: (B, H, W, 2) in (x, y) pixel units."""
    B, H, W, _ = flow.shape
    if size_type == "ratio":
        out_h, out_w = int(H * sizes[0]), int(W * sizes[1])
    elif size_type == "shape":
        out_h, out_w = int(sizes[0]), int(sizes[1])
    else:
        raise ValueError(
            f"Size type should be ratio or shape, but got type {size_type}.")
    scaled = jnp.stack([flow[..., 0] * (out_w / W),
                        flow[..., 1] * (out_h / H)], axis=-1)
    if interp_mode == "bilinear":
        return resize_bilinear(scaled, (out_h, out_w),
                               align_corners=align_corners)
    if interp_mode == "nearest":
        return resize_nearest(scaled, (out_h, out_w))
    raise ValueError(f"unsupported interp_mode {interp_mode}")


class ModulatedDeformConvPack(nn.Module):
    """DCNv2 pack: offsets+mask predicted by a zero-initialised conv on
    the *input itself* (ops/dcn/deform_conv.py:286-342)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    deformable_groups: int = 1

    def _offset_conv(self, feat):
        kh, kw = self.kernel_size
        n = self.deformable_groups * kh * kw
        out = Conv2d(3 * n, self.kernel_size, strides=self.stride,
                     padding=self.padding[0],
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     name="conv_offset")(feat)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        # torch chunks then cats (deform_conv.py:335-338); channel c of the
        # cat maps to (tap c//2, y/x c%2) — identical to our packed layout.
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(mask)
        return offset, mask

    def _dcn(self, x, offset, mask):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        weight = self.param(
            "weight", torch_conv_kernel_init,
            (kh, kw, in_ch // self.groups, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return modulated_deform_conv2d(
            x, offset, mask, weight, bias, self.stride, self.padding,
            self.dilation, self.groups, self.deformable_groups)

    @nn.compact
    def __call__(self, x):
        offset, mask = self._offset_conv(x)
        return self._dcn(x, offset, mask)


class DCNv2Pack(ModulatedDeformConvPack):
    """Deformable-alignment DCN: offsets/mask come from a second feature
    map (arch_util.py:209-236)."""

    @nn.compact
    def __call__(self, x, feat):
        offset, mask = self._offset_conv(feat)
        return self._dcn(x, offset, mask)
