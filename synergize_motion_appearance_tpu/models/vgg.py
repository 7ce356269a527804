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

from ..utils.env import env_flag_default
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
        # dtype-preserving normalization: the f32 constants would
        # silently promote a bf16 pyramid back to f32 at the VGG entry,
        # doubling every VGG activation byte in the mixed-precision
        # train step (the f32[B,256,256,64] layout-copy class in the
        # §11b trace was VGG slice-1 running promoted). Measured A/B
        # docs/PERF.md §18: −19 ms/step at b8-selective, −2 ms at b2 —
        # DEFAULT ON; SAMT_VGG_DT=0 reverts to the promoting form.
        # No effect on f32 graphs (constants cast to x.dtype = f32).
        # Flag is read at trace time (strict parse, utils/env.py).
        if env_flag_default("SAMT_VGG_DT", True):
            mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(_IMAGENET_STD, x.dtype)
            x = (x - mean) / std
        else:
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


# layer-name sequences per vgg type (vgg_arch.py:13-36); channels of a
# conv follow its block index: block 1..5 -> 64/128/256/512/512
_VGG_NAMES = {
    "vgg11": [
        "conv1_1", "relu1_1", "pool1", "conv2_1", "relu2_1", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "pool3",
        "conv4_1", "relu4_1", "conv4_2", "relu4_2", "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "pool5"],
    "vgg13": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
        "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "pool3",
        "conv4_1", "relu4_1", "conv4_2", "relu4_2", "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "pool5"],
    "vgg16": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
        "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
        "pool3",
        "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
        "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
        "pool5"],
    "vgg19": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
        "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
        "conv3_4", "relu3_4", "pool3",
        "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
        "conv4_4", "relu4_4", "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
        "conv5_4", "relu5_4", "pool5"],
}
_BLOCK_CHANNELS = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}


class VGGFeatureExtractor(nn.Module):
    """Named-layer VGG extractor (vgg_arch.py:57-164): forward returns a
    {layer_name: feature} dict for the requested taps. Params are named
    by layer (``conv3_2``) so torchvision weights map positionally."""

    layer_name_list: Sequence[str]
    vgg_type: str = "vgg19"
    use_input_norm: bool = True
    range_norm: bool = False
    remove_pooling: bool = False
    pooling_stride: int = 2

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        names = _VGG_NAMES[self.vgg_type]
        for v in self.layer_name_list:
            if v not in names:
                raise ValueError(f"layer {v!r} not in {self.vgg_type}")
        max_idx = max(names.index(v) for v in self.layer_name_list)
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        wanted = set(self.layer_name_list)
        out: Dict[str, jnp.ndarray] = {}
        for name in names[:max_idx + 1]:
            if name.startswith("conv"):
                block = int(name[4])
                x = Conv2d(_BLOCK_CHANNELS[block], (3, 3), padding=1,
                           name=name)(x)
            elif name.startswith("relu"):
                x = jax.nn.relu(x)
            elif name.startswith("pool"):
                if self.remove_pooling:
                    continue
                x = nn.max_pool(x, (2, 2), strides=(self.pooling_stride,
                                                    self.pooling_stride))
            if name in wanted:
                out[name] = x
        return out
