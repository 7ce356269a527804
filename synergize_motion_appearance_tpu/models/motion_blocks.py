"""FOMM-style motion network blocks (Hourglass family).

Parity targets: utils/motion_estimator_util.py —
ResBlock2d (:163-185), UpBlock2d (:214-231), DownBlock2d (:363-380),
SameBlock2d (:383-398), Encoder (:440-459), Decoder (:462-492),
Hourglass (:551-563). BatchNorm here is the cross-replica-synced kind
(see layers.BatchNorm2d docstring).
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import upsample_nearest, avg_pool_2x
from .layers import Conv2d, BatchNorm2d


class ResBlock2d(nn.Module):
    features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = BatchNorm2d(self.features, name="norm1")(x, train)
        out = jax.nn.relu(out)
        out = Conv2d(self.features, (self.kernel_size,) * 2,
                     padding=self.padding, name="conv1")(out)
        out = BatchNorm2d(self.features, name="norm2")(out, train)
        out = jax.nn.relu(out)
        out = Conv2d(self.features, (self.kernel_size,) * 2,
                     padding=self.padding, name="conv2")(out)
        return out + x


class UpBlock2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        out = upsample_nearest(x, 2)
        out = Conv2d(self.features, (3, 3), padding=1, name="conv")(out)
        out = BatchNorm2d(self.features, name="norm")(out, train)
        return jax.nn.relu(out)


class DownBlock2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        out = Conv2d(self.features, (3, 3), padding=1, name="conv")(x)
        out = BatchNorm2d(self.features, name="norm")(out, train)
        out = jax.nn.relu(out)
        return avg_pool_2x(out)


class SameBlock2d(nn.Module):
    features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = Conv2d(self.features, (self.kernel_size,) * 2,
                     padding=self.padding, name="conv")(x)
        out = BatchNorm2d(self.features, name="norm")(out, train)
        return jax.nn.relu(out)


class HourglassEncoder(nn.Module):
    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, x, train: bool):
        outs = [x]
        for i in range(self.num_blocks):
            feats = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            outs.append(
                DownBlock2d(feats, name=f"down_{i}")(outs[-1], train)
            )
        return outs


class HourglassDecoder(nn.Module):
    """Returns the list of per-stage concat outputs (reference mode=1);
    callers wanting only the final feature take [-1]."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @property
    def out_filters(self) -> int:
        return self.block_expansion + self.in_features

    @nn.compact
    def __call__(self, skips: List[jnp.ndarray], train: bool):
        skips = list(skips)
        out = skips.pop()
        outs = []
        for j, i in enumerate(reversed(range(self.num_blocks))):
            out_filters = min(self.max_features, self.block_expansion * (2 ** i))
            out = UpBlock2d(out_filters, name=f"up_{j}")(out, train)
            skip = skips.pop()
            out = jnp.concatenate([out, skip], axis=-1)
            outs.append(out)
        return outs


class Hourglass(nn.Module):
    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @property
    def out_filters(self) -> int:
        return self.block_expansion + self.in_features

    @nn.compact
    def __call__(self, x, train: bool, mode: int = 0):
        skips = HourglassEncoder(
            self.block_expansion, self.num_blocks, self.max_features,
            name="encoder",
        )(x, train)
        outs = HourglassDecoder(
            self.block_expansion, self.in_features, self.num_blocks,
            self.max_features, name="decoder",
        )(skips, train)
        return outs if mode == 1 else outs[-1]
