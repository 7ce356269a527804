"""VGG19 feature extractor for perceptual losses.

Parity target: archs/vgg_arch.py:166-207 (Vgg19, 5 slices ending at
relu1_1/relu2_1/relu3_1/relu4_1/relu5_1) and :57-164 (named-layer
VGGFeatureExtractor). Pretrained torchvision weights are converted offline
with tools/convert_vgg_weights.py (zero-egress environments can't download;
the loss works with any weight pytree of the same structure).

Note: the reference normalizes with ImageNet mean/std computed for [0,1]
images but feeds [-1,1]-normalized frames straight in — we reproduce that
faithfully rather than "fixing" it.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv2d

# (out_channels per conv, pool positions) of VGG19 `features`
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

# slice boundaries in torchvision `features` indices (vgg_arch.py:179-188)
_SLICE_ENDS_CONV = [1, 3, 5, 9, 13]  # number of convs consumed per slice end

# numpy (not jnp) so importing this module never initializes a jax backend
import numpy as _np

_IMAGENET_MEAN = _np.asarray([0.485, 0.456, 0.406],
                             dtype=_np.float32).reshape(1, 1, 1, 3)
_IMAGENET_STD = _np.asarray([0.229, 0.224, 0.225],
                            dtype=_np.float32).reshape(1, 1, 1, 3)


def _max_pool_2x(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class VGG19Features(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1]."""

    @nn.compact
    def __call__(self, x):
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        outs: List[jnp.ndarray] = []
        conv_i = 0
        slice_ends = set(_SLICE_ENDS_CONV)
        for item in _VGG19_CFG:
            if item == "M":
                x = _max_pool_2x(x)
                continue
            x = Conv2d(item, (3, 3), padding=1, name=f"conv{conv_i}")(x)
            x = jax.nn.relu(x)
            conv_i += 1
            if conv_i in slice_ends:
                outs.append(x)
            if len(outs) == 5:
                break
        return outs
