"""Unsupervised keypoint detector (FOMM-style).

Parity target: archs/keypoint_detector_arch.py:13-87 —
AntiAlias down x scale_factor -> Hourglass -> 7x7 conv (pad 0) -> softmax
heatmap (temperature) -> soft-argmax kp + heatmap-weighted per-kp 2x2
Jacobian from a 4*K-channel 7x7 conv whose weight is zero-init and bias is
identity ([1,0,0,1] per kp).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import antialias_downsample, softargmax_kp, make_coordinate_grid
from .layers import Conv2d, torch_conv_kernel_init
from .motion_blocks import Hourglass


def _zeros_kernel_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class KPDetector(nn.Module):
    block_expansion: int = 32
    num_kp: int = 15
    num_channels: int = 3
    max_features: int = 1024
    num_blocks: int = 5
    temperature: float = 0.1
    estimate_jacobian: bool = True
    scale_factor: float = 0.25
    single_jacobian_map: bool = False
    pad: int = 0

    @nn.compact
    def __call__(self, image, train: bool = False,
                 pre_downsampled: bool = False) -> Dict[str, jnp.ndarray]:
        """image: (B, H, W, 3) in [-1, 1]. Returns {'value': (B,K,2),
        'jacobian': (B,K,2,2)}. pre_downsampled=True skips the anti-alias
        pyramid (caller already applied the identical blur+stride — used
        to shrink host->device keypoint traffic 16x)."""
        x = image
        if self.scale_factor != 1 and not pre_downsampled:
            x = antialias_downsample(x, self.scale_factor)

        feature_map = Hourglass(
            self.block_expansion,
            in_features=self.num_channels,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            name="predictor",
        )(x, train)

        prediction = Conv2d(
            self.num_kp, (7, 7), padding=self.pad, name="kp"
        )(feature_map)  # (B, h, w, K)

        B, h, w, K = prediction.shape
        heatmap = prediction.reshape(B, h * w, K)
        heatmap = jax.nn.softmax(heatmap / self.temperature, axis=1)
        heatmap = heatmap.reshape(B, h, w, K)

        # soft-argmax over the normalized heatmap (gaussian2kp, :48-58)
        hm_bkhw = jnp.transpose(heatmap, (0, 3, 1, 2))
        value = softargmax_kp(hm_bkhw)
        out = {"value": value}

        if self.estimate_jacobian:
            num_jac = 1 if self.single_jacobian_map else self.num_kp
            bias_init_vals = jnp.tile(
                jnp.asarray([1.0, 0.0, 0.0, 1.0]), (num_jac,)
            )
            jacobian_map = nn.Conv(
                features=4 * num_jac,
                kernel_size=(7, 7),
                padding=((self.pad, self.pad), (self.pad, self.pad)),
                kernel_init=_zeros_kernel_init,
                bias_init=lambda key, shape, dtype=jnp.float32: bias_init_vals.astype(dtype),
                name="jacobian",
            )(feature_map)  # (B, h, w, 4*num_jac)
            jac = jacobian_map.reshape(B, h, w, num_jac, 4)
            # heatmap-weighted sum over spatial positions (:79-84)
            if num_jac == self.num_kp:
                jac = jnp.einsum(
                    "bhwk,bhwkf->bkf", heatmap, jac,
                    precision=jax.lax.Precision.HIGHEST,
                )
            else:  # single shared jacobian map, weighted per-kp heatmap
                jac = jnp.einsum(
                    "bhwk,bhwf->bkf", heatmap, jac[..., 0, :],
                    precision=jax.lax.Precision.HIGHEST,
                )
            out["jacobian"] = jac.reshape(B, self.num_kp, 2, 2)
        return out
