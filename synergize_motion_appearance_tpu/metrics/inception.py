"""FID InceptionV3 feature extractor, native JAX/flax (NHWC).

Parity target: the reference vendors pytorch-fid's InceptionV3
(basicsr/metrics/pytorch_fid/inception.py:16-328) — torchvision's
Inception3 with the FID patches: InceptionA/C and the first InceptionE use
TF-style average pooling (count_include_pad=False), the second InceptionE
uses max pooling, aux logits are dropped, and the classifier head is
ignored (`fid_inception_v3`, inception.py:184-208). Features are the
2048-d final-average-pool activations ("pool3", block index 3,
inception.py:24-29).

This is an inference-only network: BatchNorm (eps=0.001, torchvision
BasicConv2d) is applied with stored running statistics kept as plain
params, so the whole model is one pure function — no mutable collections.
Weights come from the standard `pt_inception-2015-12-05` torch state_dict
via `convert_torch_inception` (tools/convert_fid_inception.py).

Input: NHWC float in [0, 1]; resized to 299x299 (bilinear,
align_corners=False, inception.py:146-150) and scaled to [-1, 1]
(inception.py:152-153) inside `extract_features`.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def _avg_pool_tf(x):
    """3x3 stride-1 avg pool, pad 1, count_include_pad=False — the
    TF-parity patch (inception.py:227-229)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=False)


def _max_pool(x, window=3, stride=2, pad=0):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((pad, pad), (pad, pad)))


class BasicConv2d(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=0.001) + relu,
    with BN running stats folded in at apply time (eval only)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), self.strides, self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        f = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (f,))
        bias = self.param("bn_bias", nn.initializers.zeros, (f,))
        mean = self.param("bn_mean", nn.initializers.zeros, (f,))
        var = self.param("bn_var", nn.initializers.ones, (f,))
        a = (scale * jax.lax.rsqrt(var + 1e-3)).astype(y.dtype)
        b = (bias - mean * scale * jax.lax.rsqrt(var + 1e-3)).astype(y.dtype)
        return jax.nn.relu(y * a + b)


def _conv(f, k, s=1, p=0, name=None):
    if isinstance(k, int):
        k = (k, k)
    if isinstance(p, int):
        p = ((p, p), (p, p))
    else:
        p = ((p[0], p[0]), (p[1], p[1]))
    return BasicConv2d(f, k, (s, s), p, name=name)


class InceptionA(nn.Module):
    """inception.py:211-233 (FID patch: TF avg pool)."""

    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _conv(64, 1, name="branch1x1")(x)
        b5 = _conv(48, 1, name="branch5x5_1")(x)
        b5 = _conv(64, 5, p=2, name="branch5x5_2")(b5)
        b3 = _conv(64, 1, name="branch3x3dbl_1")(x)
        b3 = _conv(96, 3, p=1, name="branch3x3dbl_2")(b3)
        b3 = _conv(96, 3, p=1, name="branch3x3dbl_3")(b3)
        bp = _conv(self.pool_features, 1, name="branch_pool")(_avg_pool_tf(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    """torchvision InceptionB (Mixed_6a; unpatched — no pool conv)."""

    @nn.compact
    def __call__(self, x):
        b3 = _conv(384, 3, s=2, name="branch3x3")(x)
        bd = _conv(64, 1, name="branch3x3dbl_1")(x)
        bd = _conv(96, 3, p=1, name="branch3x3dbl_2")(bd)
        bd = _conv(96, 3, s=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


class InceptionC(nn.Module):
    """inception.py:236-261 (FID patch: TF avg pool)."""

    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = _conv(192, 1, name="branch1x1")(x)
        b7 = _conv(c7, 1, name="branch7x7_1")(x)
        b7 = _conv(c7, (1, 7), p=(0, 3), name="branch7x7_2")(b7)
        b7 = _conv(192, (7, 1), p=(3, 0), name="branch7x7_3")(b7)
        bd = _conv(c7, 1, name="branch7x7dbl_1")(x)
        bd = _conv(c7, (7, 1), p=(3, 0), name="branch7x7dbl_2")(bd)
        bd = _conv(c7, (1, 7), p=(0, 3), name="branch7x7dbl_3")(bd)
        bd = _conv(c7, (7, 1), p=(3, 0), name="branch7x7dbl_4")(bd)
        bd = _conv(192, (1, 7), p=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _conv(192, 1, name="branch_pool")(_avg_pool_tf(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    """torchvision InceptionD (Mixed_7a; unpatched)."""

    @nn.compact
    def __call__(self, x):
        b3 = _conv(192, 1, name="branch3x3_1")(x)
        b3 = _conv(320, 3, s=2, name="branch3x3_2")(b3)
        b7 = _conv(192, 1, name="branch7x7x3_1")(x)
        b7 = _conv(192, (1, 7), p=(0, 3), name="branch7x7x3_2")(b7)
        b7 = _conv(192, (7, 1), p=(3, 0), name="branch7x7x3_3")(b7)
        b7 = _conv(192, 3, s=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


class InceptionE(nn.Module):
    """inception.py:264-328. pool='avg_tf' for Mixed_7b (FIDInceptionE_1),
    'max' for Mixed_7c (FIDInceptionE_2, inception.py:320-325)."""

    pool: str = "avg_tf"

    @nn.compact
    def __call__(self, x):
        b1 = _conv(320, 1, name="branch1x1")(x)
        b3 = _conv(384, 1, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _conv(384, (1, 3), p=(0, 1), name="branch3x3_2a")(b3),
            _conv(384, (3, 1), p=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = _conv(448, 1, name="branch3x3dbl_1")(x)
        bd = _conv(384, 3, p=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _conv(384, (1, 3), p=(0, 1), name="branch3x3dbl_3a")(bd),
            _conv(384, (3, 1), p=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "max":
            pooled = _max_pool(x, 3, 1, 1)
        else:
            pooled = _avg_pool_tf(x)
        bp = _conv(192, 1, name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Blocks 0-3 of pytorch-fid's InceptionV3 (inception.py:84-124).

    __call__ takes NHWC input already resized/normalized to 299x299
    [-1, 1] and returns the features of `output_blocks` (default: the
    2048-d pool3 vector), matching InceptionV3.forward.
    """

    output_blocks: Sequence[int] = (3,)

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs: List[jnp.ndarray] = []
        last = max(self.output_blocks)
        # Block 0: input -> maxpool1 (inception.py:85-91)
        x = _conv(32, 3, s=2, name="Conv2d_1a_3x3")(x)
        x = _conv(32, 3, name="Conv2d_2a_3x3")(x)
        x = _conv(64, 3, p=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        if 0 in self.output_blocks:
            outs.append(x)
        if last == 0:
            return outs
        # Block 1: -> maxpool2 (inception.py:94-100)
        x = _conv(80, 1, name="Conv2d_3b_1x1")(x)
        x = _conv(192, 3, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        if 1 in self.output_blocks:
            outs.append(x)
        if last == 1:
            return outs
        # Block 2: -> pre-aux (inception.py:103-114)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        if 2 in self.output_blocks:
            outs.append(x)
        if last == 2:
            return outs
        # Block 3: -> final avgpool (inception.py:117-124)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg_tf", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg -> 1x1
        outs.append(x)
        return outs


def preprocess(images01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] NHWC any-size -> 299x299 [-1,1] (inception.py:146-153)."""
    from ..ops.interp import resize_bilinear

    x = images01.astype(jnp.float32)
    if x.shape[1:3] != (299, 299):
        x = resize_bilinear(x, (299, 299), align_corners=False)
    return 2.0 * x - 1.0


def extract_features(params, images01: jnp.ndarray) -> jnp.ndarray:
    """Pool3 2048-d features for a [0,1] NHWC batch."""
    model = FIDInceptionV3()
    out = model.apply({"params": params}, preprocess(images01))
    return out[-1].reshape(images01.shape[0], -1)


# ---------------------------------------------------------------------------
# torch state_dict -> flax params
# ---------------------------------------------------------------------------

def convert_torch_inception(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a `pt_inception-2015-12-05` (or torchvision inception_v3)
    state_dict onto FIDInceptionV3's param tree. Accepts tensors or numpy
    arrays; the classifier (`fc.*`) and aux head are dropped — FID never
    uses them (inception.py:116-124)."""
    params: Dict[str, Any] = {}

    def _np(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        *scope, attr = parts
        if attr == "num_batches_tracked":
            continue
        # scope like [Mixed_5b, branch1x1, conv] / [Conv2d_1a_3x3, bn]
        mod_path = scope[:-1]  # drop trailing 'conv'/'bn'
        leaf_kind = scope[-1]
        node = params
        for p in mod_path:
            node = node.setdefault(p, {})
        v = _np(value)
        if leaf_kind == "conv":
            assert attr == "weight", key
            node["kernel"] = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif leaf_kind == "bn":
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean",
                    "running_var": "bn_var"}[attr]
            node[name] = v
        else:  # pragma: no cover - unknown leaves are a converter bug
            raise KeyError(f"unrecognized inception key: {key}")
    return params
