"""Extended motion-block library — completes the reference inventory.

Parity targets in utils/motion_estimator_util.py: WN* weight-norm blocks
(:189-416), ResBottleneck (:272-301), SubPixel blocks (:304-341),
pixel-shuffle Downsample/Upsample (:419-437), Decoder_w_emb (:494-521),
Hourglass_2branch (:565-581), Hourglass_w_emb (:584-598), SPADE (:648-710),
3D blocks + KPHourglass (:233-251, :970-1001), TPS 'kp' mode (:723-809),
head-pose math (:92-161), SinusoidalPositionalEmbedding (:811-967),
make_coordinate_grid_3d (:74-90).

These are part of the framework surface (other configs / the acknowledged
upstream models use them) even though the flagship config doesn't.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import make_coordinate_grid, upsample_nearest, avg_pool_2x
from .layers import Conv2d, BatchNorm2d, torch_conv_kernel_init
from .motion_blocks import (
    DownBlock2d, HourglassEncoder, UpBlock2d,
)


# ---------------------------------------------------------------------------
# weight-normalized variants (weight_norm reparam: w = g * v / ||v||)
# ---------------------------------------------------------------------------

class WNConv2d(nn.Module):
    """Conv with torch weight_norm reparameterization (per-output-channel
    magnitude g, direction v)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        shape = (kh, kw, in_ch // self.groups, self.features)
        v = self.param("v", torch_conv_kernel_init, shape)
        # g initialized to ||v|| so initial output matches plain conv
        g = self.param(
            "g",
            lambda key, s: jnp.sqrt(
                jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1, 2))
            ),
            (self.features,),
        )
        norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1, 2), keepdims=True))
        kernel = v / (norm + 1e-12) * g
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        ) + bias


class WNResBlock2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = jax.nn.relu(x)
        out = WNConv2d(self.features, name="conv1")(out)
        out = jax.nn.relu(out)
        out = WNConv2d(self.features, name="conv2")(out)
        return out + x


class WNUpBlock2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = upsample_nearest(x, 2)
        out = WNConv2d(self.features, name="conv")(out)
        out = BatchNorm2d(self.features, name="norm")(out, train)
        return jax.nn.relu(out)


class WNDownBlock2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = WNConv2d(self.features, name="conv")(x)
        out = jax.nn.relu(out)
        return avg_pool_2x(out)


class WNSameBlock2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = WNConv2d(self.features, name="conv")(x)
        return jax.nn.relu(out)


class ResBottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with BN (:272-301)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        f4 = self.features // 4
        out = Conv2d(f4, (1, 1), padding=0, name="conv1")(x)
        out = BatchNorm2d(f4, name="norm1")(out, train)
        out = jax.nn.relu(out)
        out = Conv2d(f4, (3, 3), strides=(self.stride,) * 2, padding=1,
                     name="conv2")(out)
        out = BatchNorm2d(f4, name="norm2")(out, train)
        out = jax.nn.relu(out)
        out = Conv2d(self.features, (1, 1), padding=0, name="conv3")(out)
        out = BatchNorm2d(self.features, name="norm3")(out, train)
        if self.stride != 1:
            x = Conv2d(self.features, (1, 1),
                       strides=(self.stride,) * 2, padding=0,
                       name="skip")(x)
            x = BatchNorm2d(self.features, name="norm4")(x, train)
        return jax.nn.relu(out + x)


# ---------------------------------------------------------------------------
# pixel-shuffle resampling (:419-437)
# ---------------------------------------------------------------------------

def pixel_shuffle(x, factor: int):
    B, H, W, C = x.shape
    c = C // (factor * factor)
    x = x.reshape(B, H, W, factor, factor, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * factor, W * factor, c)


def pixel_unshuffle(x, factor: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // factor, W // factor, C * factor * factor)


class PixelShuffleUpsample(nn.Module):
    """conv(dim -> dim*s^2) + PixelShuffle (:429-437)."""

    scale: int = 2

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        out = Conv2d(dim * self.scale ** 2, (3, 3), padding=1,
                     use_bias=False, name="conv")(x)
        return pixel_shuffle(out, self.scale)


class PixelUnshuffleDownsample(nn.Module):
    """conv(dim -> dim/s^2) + PixelUnshuffle (:419-427)."""

    scale: int = 2

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        out = Conv2d(dim // self.scale ** 2, (3, 3), padding=1,
                     use_bias=False, name="conv")(x)
        return pixel_unshuffle(out, self.scale)


class SubPixelUpBlock2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = PixelShuffleUpsample(2, name="upsample")(x)
        out = Conv2d(self.features, (3, 3), padding=1, name="conv")(out)
        out = BatchNorm2d(self.features, name="norm")(out, train)
        return jax.nn.relu(out)


# ---------------------------------------------------------------------------
# Hourglass variants (:494-598)
# ---------------------------------------------------------------------------

class DecoderWEmb(nn.Module):
    """Decoder returning (final, per-stage feats) (:494-521)."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, skips: List[jnp.ndarray], train: bool = False):
        skips = list(skips)
        out = skips.pop()
        feats = [out]
        for j, i in enumerate(reversed(range(self.num_blocks))):
            out_filters = min(self.max_features,
                              self.block_expansion * (2 ** i))
            out = UpBlock2d(out_filters, name=f"up_{j}")(out, train)
            skip = skips.pop()
            feats.append(skip)
            out = jnp.concatenate([out, skip], axis=-1)
        return out, feats


class Hourglass2Branch(nn.Module):
    """Shared encoder + two decoders (kp / mask) (:565-581)."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .motion_blocks import HourglassDecoder

        skips = HourglassEncoder(
            self.block_expansion, self.num_blocks, self.max_features,
            name="encoder",
        )(x, train)
        kp = HourglassDecoder(
            self.block_expansion, self.in_features, self.num_blocks,
            self.max_features, name="decoder_kp",
        )(skips, train)[-1]
        mask = HourglassDecoder(
            self.block_expansion, self.in_features, self.num_blocks,
            self.max_features, name="decoder_mask",
        )(skips, train)[-1]
        return kp, mask


class HourglassWEmb(nn.Module):
    """Hourglass returning (feats, final) (:584-598)."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = HourglassEncoder(
            self.block_expansion, self.num_blocks, self.max_features,
            name="encoder",
        )(x, train)
        out, feats = DecoderWEmb(
            self.block_expansion, self.in_features, self.num_blocks,
            self.max_features, name="decoder",
        )(skips, train)
        return feats, out


# ---------------------------------------------------------------------------
# SPADE (:648-710)
# ---------------------------------------------------------------------------

class SPADE(nn.Module):
    norm_nc: int
    label_nc: int

    @nn.compact
    def __call__(self, x, segmap):
        from ..ops import resize_nearest

        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        normalized = (x - mean) * jax.lax.rsqrt(var + 1e-5)

        segmap = resize_nearest(segmap, x.shape[1:3])
        actv = jax.nn.relu(
            Conv2d(128, (3, 3), padding=1, name="mlp_shared")(segmap)
        )
        gamma = Conv2d(self.norm_nc, (3, 3), padding=1,
                       name="mlp_gamma")(actv)
        beta = Conv2d(self.norm_nc, (3, 3), padding=1,
                      name="mlp_beta")(actv)
        return normalized * (1 + gamma) + beta


class SPADEResnetBlock(nn.Module):
    fin: int
    fout: int
    label_nc: int

    @nn.compact
    def __call__(self, x, seg):
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout

        dx = SPADE(self.fin, self.label_nc, name="norm_0")(x, seg)
        dx = Conv2d(fmiddle, (3, 3), padding=1, name="conv_0")(
            jax.nn.leaky_relu(dx, 0.2)
        )
        dx = SPADE(fmiddle, self.label_nc, name="norm_1")(dx, seg)
        dx = Conv2d(self.fout, (3, 3), padding=1, name="conv_1")(
            jax.nn.leaky_relu(dx, 0.2)
        )
        if learned_shortcut:
            xs = SPADE(self.fin, self.label_nc, name="norm_s")(x, seg)
            xs = Conv2d(self.fout, (1, 1), padding=0, use_bias=False,
                        name="conv_s")(xs)
        else:
            xs = x
        return xs + dx


# ---------------------------------------------------------------------------
# 3D blocks + KPHourglass (:233-251, :970-1001)
# ---------------------------------------------------------------------------

def make_coordinate_grid_3d(d: int, h: int, w: int, dtype=jnp.float32):
    """(d, h, w, 3) grid of (x, y, z) in [-1,1]^3 (:74-90)."""
    x = 2.0 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1.0
    y = 2.0 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1.0
    z = 2.0 * (jnp.arange(d, dtype=dtype) / (d - 1)) - 1.0
    zz = jnp.broadcast_to(z[:, None, None], (d, h, w))
    yy = jnp.broadcast_to(y[None, :, None], (d, h, w))
    xx = jnp.broadcast_to(x[None, None, :], (d, h, w))
    return jnp.stack([xx, yy, zz], axis=-1)


class UpBlock3d(nn.Module):
    """3D up block: nearest (1,2,2) upsample + conv3d + BN (:233-251).
    Layout NDHWC."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, D, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        x = nn.Conv(self.features, (3, 3, 3), padding=1,
                    kernel_init=torch_conv_kernel_init)(x)
        x = BatchNorm2d(self.features, name="norm")(x, train)
        return jax.nn.relu(x)


class KPHourglass(nn.Module):
    """2D down blocks -> reshape to 3D volume -> 3D up blocks (:970-1001)."""

    block_expansion: int
    in_features: int
    reshape_features: int
    reshape_depth: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = x
        for i in range(self.num_blocks):
            feats = min(self.max_features,
                        self.block_expansion * (2 ** (i + 1)))
            out = DownBlock2d(feats, name=f"down{i}")(out, train)
        out = Conv2d(self.reshape_features, (1, 1), padding=0,
                     name="conv")(out)
        B, H, W, C = out.shape
        out = out.reshape(B, H, W, self.reshape_depth,
                          C // self.reshape_depth)
        out = out.transpose(0, 3, 1, 2, 4)  # (B, D, H, W, C')
        for i in range(self.num_blocks):
            feats = min(self.max_features,
                        self.block_expansion
                        * (2 ** (self.num_blocks - i - 1)))
            out = UpBlock3d(feats, name=f"up{i}")(out, train)
        return out


# ---------------------------------------------------------------------------
# head-pose math (:92-161)
# ---------------------------------------------------------------------------

def headpose_pred_to_degree(pred):
    """66-bin softmax head-pose logits -> degrees (:92-99)."""
    idx = jnp.arange(66, dtype=pred.dtype)
    p = jax.nn.softmax(pred, axis=-1)
    return jnp.sum(p * idx[None], axis=1) * 3 - 99


def get_rotation_matrix(yaw, pitch, roll):
    """(B,) degrees -> (B, 3, 3) rotation, pitch @ yaw @ roll (:101-129)."""
    yaw = yaw / 180 * jnp.pi
    pitch = pitch / 180 * jnp.pi
    roll = roll / 180 * jnp.pi
    o, z = jnp.ones_like(pitch), jnp.zeros_like(pitch)
    pitch_mat = jnp.stack([
        o, z, z, z, jnp.cos(pitch), -jnp.sin(pitch),
        z, jnp.sin(pitch), jnp.cos(pitch),
    ], axis=1).reshape(-1, 3, 3)
    yaw_mat = jnp.stack([
        jnp.cos(yaw), z, jnp.sin(yaw), z, o, z,
        -jnp.sin(yaw), z, jnp.cos(yaw),
    ], axis=1).reshape(-1, 3, 3)
    roll_mat = jnp.stack([
        jnp.cos(roll), -jnp.sin(roll), z,
        jnp.sin(roll), jnp.cos(roll), z, z, z, o,
    ], axis=1).reshape(-1, 3, 3)
    return jnp.einsum("bij,bjk,bkm->bim", pitch_mat, yaw_mat, roll_mat)


def keypoint_transformation(kp_canonical, he):
    """Canonical 3D kp + head-pose dict -> posed kp (:131-161)."""
    kp = kp_canonical["value"]  # (B, K, 3)
    yaw = headpose_pred_to_degree(he["yaw"])
    pitch = headpose_pred_to_degree(he["pitch"])
    roll = headpose_pred_to_degree(he["roll"])
    rot = get_rotation_matrix(yaw, pitch, roll)
    kp_rotated = jnp.einsum("bmp,bkp->bkm", rot, kp)
    kp_t = kp_rotated + he["t"][:, None, :]
    exp = he["exp"].reshape(kp.shape[0], -1, 3)
    kp_transformed = kp_t + exp
    out = {"value": kp_transformed, "jacobian": None}
    if kp_canonical.get("jacobian") is not None:
        jt = jnp.einsum("bmp,bkps->bkms", rot, kp_canonical["jacobian"])
        if "exp_jacobian" in he:
            jt = jt + he["exp_jacobian"].reshape(kp.shape[0], -1, 3, 3)
        out["jacobian"] = jt
    return out


# ---------------------------------------------------------------------------
# TPS 'kp' mode (:723-809) — keypoint-driven thin-plate splines
# ---------------------------------------------------------------------------

def tps_kp_params(kp_1, kp_2, reg: float = 0.01):
    """Fit per-group TPS mapping kp_1 -> kp_2.

    kp_1, kp_2: (B, G, N, 2). Returns (theta (B,G,2,3),
    control_points=kp_1, control_params (B,G,N,2)).
    Uses r^2 log(r^2 + 1e-9) radial basis like the reference (:744-765).
    """
    B, G, N, _ = kp_1.shape
    d = kp_1[:, :, :, None, :] - kp_1[:, :, None, :, :]
    K = jnp.sum(d ** 2, axis=-1)
    K = K * jnp.log(K + 1e-9)
    one = jnp.ones((B, G, N, 1), kp_1.dtype)
    kp1p = jnp.concatenate([kp_1, one], axis=3)  # (B,G,N,3)
    zeros33 = jnp.zeros((B, G, 3, 3), kp_1.dtype)
    P = jnp.concatenate([kp1p, zeros33], axis=2)  # (B,G,N+3,3)
    L = jnp.concatenate([K, jnp.swapaxes(kp1p, 2, 3)], axis=2)
    L = jnp.concatenate([L, P], axis=3)  # (B,G,N+3,N+3)
    zeros32 = jnp.zeros((B, G, 3, 2), kp_1.dtype)
    Y = jnp.concatenate([kp_2, zeros32], axis=2)
    L = L + jnp.eye(L.shape[2], dtype=kp_1.dtype) * reg
    param = jnp.linalg.solve(L.astype(jnp.float32), Y.astype(jnp.float32))
    theta = jnp.swapaxes(param[:, :, N:, :], 2, 3)  # (B,G,2,3)
    control_params = param[:, :, :N, :]
    return theta, kp_1, control_params


def tps_kp_warp(theta, control_points, control_params, coordinates):
    """Warp (B, M, 2) coordinates through the fitted kp-TPS
    (:783-792). Returns (B, G, M, 2)."""
    affine = jnp.einsum("bgij,bmj->bgmi", theta[..., :2], coordinates)
    affine = affine + theta[..., 2][:, :, None, :]  # (B,G,1,2) bias
    d = coordinates[:, None, :, None, :] - control_points[:, :, None, :, :]
    r2 = jnp.sum(d ** 2, axis=-1)  # (B,G,M,N)
    radial = r2 * jnp.log(r2 + 1e-9)
    res = jnp.einsum("bgmn,bgni->bgmi", radial, control_params)
    return affine + res


# ---------------------------------------------------------------------------
# sinusoidal positional embedding (:811-967)
# ---------------------------------------------------------------------------

def sinusoidal_embedding(num_embeddings: int, embedding_dim: int,
                         padding_idx: Optional[int] = None,
                         div_half_dim: bool = False) -> np.ndarray:
    half = embedding_dim // 2
    if not div_half_dim:
        emb = np.log(10000) / (half - 1)
    else:
        emb = np.log(1e4) / half
    emb = np.exp(np.arange(half, dtype=np.float64) * -emb)
    emb = np.arange(num_embeddings, dtype=np.float64)[:, None] * emb[None]
    emb = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)
    if padding_idx is not None:
        emb[padding_idx] = 0
    return emb.astype(np.float32)


def sinusoidal_grid_2d(height: int, width: int, embedding_dim: int,
                       padding_idx: int = 0) -> np.ndarray:
    """2D SPE grid (B-free): (H, W, 2*embedding_dim) (:910-956)."""
    table = sinusoidal_embedding(
        max(height, width) + padding_idx + 2, embedding_dim, padding_idx
    )
    x_emb = table[np.arange(1, width + 1)]
    y_emb = table[np.arange(1, height + 1)]
    x_grid = np.broadcast_to(x_emb[None, :, :], (height, width,
                                                 embedding_dim))
    y_grid = np.broadcast_to(y_emb[:, None, :], (height, width,
                                                 embedding_dim))
    return np.concatenate([x_grid, y_grid], axis=-1)
