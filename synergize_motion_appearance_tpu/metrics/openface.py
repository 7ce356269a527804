"""OpenFace nn4.small2 face embedder, native JAX/flax (NHWC).

Parity target: the reference's vendored torch port
(basicsr/metrics/OpenFacePytorch/loadOpenFace.py:154-222, `netOpenFace`)
used by the AED metric (basicsr/metrics/extract.py:84-102): 96x96 BGR
[0,1] face crops -> 128-d L2-normalized identity embedding; AED is the
squared L2 distance between driving and generated embeddings
(extract.py:"cmp_face_aed").

Faithful quirks reproduced:
  * Torch7-style cross-map LRN (size 5, alpha 1e-4, beta 0.75, k 1):
    divide alpha by the window size, centered channel window
    (SpatialCrossMapLRN_temp.py / nn.LocalResponseNorm fallback,
    loadOpenFace.py:49-55).
  * Inception branches with *unequal* spatial sizes are zero-padded up to
    the largest branch before concat (loadOpenFace.py:131-149) — pooling
    branches use VALID padding and come out smaller.
  * LPPool2d(p=2): sqrt of the 3x3/stride-3 window sum of squares.
  * A pool branch with no reduce conv passes raw pooled input channels
    through (layer16/layer18, reduceSize[2:] = None, loadOpenFace.py:93).
  * 128-px inputs are nearest-upsampled x3 then 4x4-avg-pooled to 96
    (loadOpenFace.py:201-202).

Weights: the published `openface.pth` torch state_dict via
`convert_openface_weights`.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def _lrn(x, size=5, alpha=1e-4, beta=0.75, k=1.0):
    """Torch cross-channel local response norm on NHWC."""
    sq = jnp.square(x)
    half = size // 2
    # sum over channel window [c-half, c+half] via padded cumulative trick
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    sq = jnp.pad(sq, pad)
    win = sum(sq[..., i:i + x.shape[-1]] for i in range(size))
    return x / jnp.power(k + (alpha / size) * win, beta)


def _max_pool_valid(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


def _max_pool_pad1(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _lp_pool2(x, window=3, stride=3):
    """LPPool2d(p=2): (sum of squares over window)^(1/2), VALID."""
    s = nn.avg_pool(jnp.square(x), (window, window),
                    strides=(stride, stride)) * (window * window)
    return jnp.sqrt(jnp.maximum(s, 0.0))


def _avg_pool_valid(x, window=3, stride=1):
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


class _ConvBnRelu(nn.Module):
    """conv + BatchNorm(eval, running stats as params) + relu — one
    `N_conv`/`N_bn` pair inside an OpenFace branch."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: int = 0
    conv_name: str = "conv"
    bn_name: str = "bn"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        kernel = self.param(f"{self.conv_name}_kernel",
                            nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        bias = self.param(f"{self.conv_name}_bias",
                          nn.initializers.zeros, (self.features,))
        p = self.padding
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (self.stride, self.stride),
            ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bias.astype(y.dtype)
        f = self.features
        scale = self.param(f"{self.bn_name}_scale",
                           nn.initializers.ones, (f,))
        b = self.param(f"{self.bn_name}_bias", nn.initializers.zeros, (f,))
        mean = self.param(f"{self.bn_name}_mean",
                          nn.initializers.zeros, (f,))
        var = self.param(f"{self.bn_name}_var", nn.initializers.ones, (f,))
        inv = jax.lax.rsqrt(var + 1e-5)
        return jax.nn.relu(
            (y - mean.astype(y.dtype)) * (scale * inv).astype(y.dtype)
            + b.astype(y.dtype))


def _pad_to(y, hw: Tuple[int, int]):
    """Center-pad NHWC to target (H, W) (loadOpenFace.py:141-147)."""
    ph, pw = hw[0] - y.shape[1], hw[1] - y.shape[2]
    pt, pl = ph // 2, pw // 2
    return jnp.pad(y, ((0, 0), (pt, ph - pt), (pl, pw - pl), (0, 0)))


class _Inception(nn.Module):
    """OpenFace Inception (loadOpenFace.py:62-151). Branch layout and
    `seq_list` indices mirror the torch port so the weight converter maps
    `layerN.seq_list.I.*` keys directly."""

    kernel_size: Sequence[int]
    kernel_stride: Sequence[int]
    output_size: Sequence[int]
    reduce_size: Sequence[Optional[int]]
    pool: str            # 'max' (3x3 s2 VALID) or 'lp' (LPPool2 3x3 s3)
    pool_stride: int = 2

    @nn.compact
    def __call__(self, x):
        ys: List[jnp.ndarray] = []
        seq = 0
        # kernel branches: 1x1 reduce -> nxn conv
        for i, k in enumerate(self.kernel_size):
            r = _ConvBnRelu(self.reduce_size[i], (1, 1), 1, 0,
                            "1_conv", "2_bn", name=f"seq{seq}_reduce")(x)
            pad = k // 2
            y = _ConvBnRelu(self.output_size[i], (k, k),
                            self.kernel_stride[i], pad,
                            "4_conv", "5_bn", name=f"seq{seq}_conv")(r)
            ys.append(y)
            seq += 1
        # pool branch (+ optional 1x1 conv)
        pooled = (_max_pool_valid(x, 3, self.pool_stride)
                  if self.pool == "max" else _lp_pool2(x))
        ii = len(self.kernel_size)
        if ii < len(self.reduce_size) and self.reduce_size[ii] is not None:
            pooled = _ConvBnRelu(self.reduce_size[ii], (1, 1), 1, 0,
                                 "2_conv", "3_bn",
                                 name=f"seq{seq}_pool")(pooled)
        ys.append(pooled)
        seq += 1
        ii += 1
        # reduce-only branch
        if ii < len(self.reduce_size) and self.reduce_size[ii] is not None:
            ys.append(_ConvBnRelu(self.reduce_size[ii], (1, 1), 1, 0,
                                  "1_conv", "2_bn",
                                  name=f"seq{seq}_reduceonly")(x))
        th = max(y.shape[1] for y in ys)
        tw = max(y.shape[2] for y in ys)
        return jnp.concatenate([_pad_to(y, (th, tw)) for y in ys], axis=-1)


class OpenFaceNet(nn.Module):
    """nn4.small2 (loadOpenFace.py:154-222). Input NHWC BGR [0,1] at
    96x96 (or 128x128, resampled as the port does); returns
    (embedding_128_l2normed, features_736)."""

    @nn.compact
    def __call__(self, x):
        if x.shape[1] == 128:
            x = jnp.repeat(jnp.repeat(x, 3, axis=1), 3, axis=2)
            x = nn.avg_pool(x, (4, 4), strides=(4, 4))
        x = _ConvBnRelu(64, (7, 7), 2, 3, "conv", "bn", name="layer1")(x)
        x = _max_pool_pad1(x)
        x = _lrn(x)
        x = _ConvBnRelu(64, (1, 1), 1, 0, "conv", "bn", name="layer6")(x)
        x = _ConvBnRelu(192, (3, 3), 1, 1, "conv", "bn", name="layer9")(x)
        x = _lrn(x)
        x = _max_pool_pad1(x)
        x = _Inception((3, 5), (1, 1), (128, 32), (96, 16, 32, 64),
                       "max", name="layer14")(x)
        x = _Inception((3, 5), (1, 1), (128, 64), (96, 32, 64, 64),
                       "lp", name="layer15")(x)
        x = _Inception((3, 5), (2, 2), (256, 64), (128, 32, None, None),
                       "max", name="layer16")(x)
        x = _Inception((3, 5), (1, 1), (192, 64), (96, 32, 128, 256),
                       "lp", name="layer17")(x)
        x = _Inception((3, 5), (2, 2), (256, 128), (160, 64, None, None),
                       "max", name="layer18")(x)
        x = _Inception((3,), (1,), (384,), (96, 96, 256),
                       "lp", name="layer19")(x)
        x = _Inception((3,), (1,), (384,), (96, 96, 256),
                       "max", name="layer21")(x)
        x = _avg_pool_valid(x, 3, 1)
        x736 = x.reshape(x.shape[0], -1)
        kernel = self.param("fc_kernel", nn.initializers.lecun_normal(),
                            (736, 128))
        bias = self.param("fc_bias", nn.initializers.zeros, (128,))
        e = x736 @ kernel.astype(x736.dtype) + bias.astype(x736.dtype)
        norm = jnp.sqrt(jnp.sum(jnp.square(e), axis=1, keepdims=True)
                        + 1e-6)
        return e / norm, x736


def embed_faces(params, faces_bgr01: jnp.ndarray) -> jnp.ndarray:
    """(B,96,96,3) BGR [0,1] -> (B,128) embeddings."""
    emb, _ = OpenFaceNet().apply({"params": params}, faces_bgr01)
    return emb


# ---------------------------------------------------------------------------
# torch state_dict -> flax params
# ---------------------------------------------------------------------------

def _np(v):
    return np.asarray(v.detach().cpu().numpy()
                      if hasattr(v, "detach") else v, np.float32)


def convert_openface_weights(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map the `openface.pth` torch state_dict onto OpenFaceNet params.

    torch keys: `layer1.weight`, `layer2.{weight,bias,running_*}`,
    `layer14.seq_list.0.1_conv.weight`, ..., `layer25.weight`."""
    params: Dict[str, Any] = {}
    # stem: conv layers paired with the following bn layer
    stem = {"layer1": ("layer1", "conv", "bn", "layer2"),
            "layer6": ("layer6", "conv", "bn", "layer7"),
            "layer9": ("layer9", "conv", "bn", "layer10")}
    bn_of = {v[3]: (v[0], v[2]) for v in stem.values()}
    bn_attr = {"weight": "scale", "bias": "bias",
               "running_mean": "mean", "running_var": "var"}

    def put(scope: str, leaf: str, v):
        params.setdefault(scope, {})[leaf] = v

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        v = _np(value)
        if parts[0] == "layer25":
            if parts[1] == "weight":
                params["fc_kernel"] = v.transpose(1, 0)
            else:
                params["fc_bias"] = v
        elif parts[0] in stem and len(parts) == 2:
            name, conv_name, _, _ = stem[parts[0]]
            leaf = (f"{conv_name}_kernel" if parts[1] == "weight"
                    else f"{conv_name}_bias")
            put(name, leaf, v.transpose(2, 3, 1, 0)
                if parts[1] == "weight" else v)
        elif parts[0] in bn_of and len(parts) == 2:
            name, bn_name = bn_of[parts[0]]
            put(name, f"{bn_name}_{bn_attr[parts[1]]}", v)
        elif parts[1] == "seq_list":
            layer, seq_idx, mod, attr = (parts[0], int(parts[2]),
                                         parts[3], parts[4])
            n_kernels = {"layer14": 2, "layer15": 2, "layer16": 2,
                         "layer17": 2, "layer18": 2, "layer19": 1,
                         "layer21": 1}[layer]
            if seq_idx < n_kernels:
                sub = ("_reduce" if mod in ("1_conv", "2_bn")
                       else "_conv")
                scope_name = f"seq{seq_idx}{sub}"
            elif seq_idx == n_kernels:
                scope_name = f"seq{seq_idx}_pool"
            else:
                scope_name = f"seq{seq_idx}_reduceonly"
            node = params.setdefault(layer, {}).setdefault(scope_name, {})
            idx_name = mod
            if idx_name.endswith("conv"):
                leaf = (f"{idx_name}_kernel" if attr == "weight"
                        else f"{idx_name}_bias")
                node[leaf] = (v.transpose(2, 3, 1, 0)
                              if attr == "weight" else v)
            else:  # bn
                node[f"{idx_name}_{bn_attr[attr]}"] = v
        else:  # pragma: no cover
            raise KeyError(f"unrecognized openface key: {key}")
    return params
