"""LPIPS (VGG-16 variant), native JAX/flax (NHWC).

Parity target: the reference scores LPIPS with the `lpips` pip package,
`lpips.LPIPS(net='vgg', spatial=False)` (basicsr/metrics/cmp_lpips.py:24),
i.e. richzhang's v0.1 linearly-calibrated model:

  input [-1,1] -> ScalingLayer (shift/scale constants)
  -> VGG16 features at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3
  -> per-layer channel-unit-normalization (eps 1e-10)
  -> squared difference -> learned 1x1 "lin" heads (no bias)
  -> spatial mean -> sum over the 5 layers.

Weights: torchvision vgg16 `features` + the lpips package's
`weights/v0.1/vgg.pth` lins, converted offline with
`convert_lpips_weights` (tools/convert_fid_inception.py --lpips).

Image protocol (cmp_lpips.py:38-44): uint8 RGB -> x/127.5 - 1
(`lpips.im2tensor(lpips.load_image(...))`).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

# lpips.ScalingLayer constants (applied to [-1,1] inputs)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32).reshape(1, 1, 1, 3)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32).reshape(1, 1, 1, 3)

# torchvision vgg16 `features` conv plan; "M" = 2x2 max pool
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]
# conv count at each tapped relu (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
_TAPS = [2, 4, 7, 10, 13]
_LIN_CHANNELS = [64, 128, 256, 512, 512]


class _VGG16Taps(nn.Module):
    """VGG16 feature slices (lpips pretrained vgg16, slices 1-5)."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs: List[jnp.ndarray] = []
        conv_i = 0
        taps = set(_TAPS)
        for item in _VGG16_CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            kernel = self.param(f"conv{conv_i}_kernel",
                                nn.initializers.lecun_normal(),
                                (3, 3, x.shape[-1], item))
            bias = self.param(f"conv{conv_i}_bias",
                              nn.initializers.zeros, (item,))
            x = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + bias.astype(x.dtype))
            conv_i += 1
            if conv_i in taps:
                outs.append(x)
        return outs


def _unit_normalize(x, eps=1e-10):
    """lpips.normalize_tensor: x / (||x||_channel + eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (n + eps)


class LPIPSVgg(nn.Module):
    """Full LPIPS-VGG distance; __call__(x, y) with NHWC [-1,1] inputs
    returns a (B,) perceptual distance."""

    @nn.compact
    def __call__(self, x, y) -> jnp.ndarray:
        def scale(v):
            return (v - _SHIFT) / _SCALE

        vgg = _VGG16Taps(name="vgg")
        fx, fy = vgg(scale(x)), vgg(scale(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (_LIN_CHANNELS[i],))
            # 1x1 conv (no bias) == channel-weighted sum
            total = total + jnp.mean(
                jnp.sum(d * w.astype(d.dtype), axis=-1), axis=(1, 2))
        return total


def lpips_distance(params, x, y):
    return LPIPSVgg().apply({"params": params}, x, y)


# ---------------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------------

def _np(v):
    return np.asarray(v.detach().cpu().numpy()
                      if hasattr(v, "detach") else v, np.float32)


def convert_lpips_weights(vgg16_sd: Dict[str, Any],
                          lin_sd: Dict[str, Any]) -> Dict[str, Any]:
    """Build LPIPSVgg params from a torchvision vgg16 state_dict (its
    `features.N.{weight,bias}` conv entries, or bare `N.weight` if the
    caller passed model.features.state_dict()) and the lpips package's
    lin state_dict (`linK.model.1.weight`, shape (1, C, 1, 1))."""
    vgg: Dict[str, Any] = {}
    conv_of_idx = {}
    conv_i, idx = 0, 0
    for item in _VGG16_CFG:
        if item == "M":
            idx += 1
            continue
        conv_of_idx[idx] = conv_i
        conv_i += 1
        idx += 2  # conv + relu
    for key, value in vgg16_sd.items():
        parts = key.split(".")
        if parts[0] == "features":
            parts = parts[1:]
        if len(parts) != 2 or not parts[0].isdigit():
            continue
        layer_idx, attr = int(parts[0]), parts[1]
        if layer_idx not in conv_of_idx:
            continue
        ci = conv_of_idx[layer_idx]
        v = _np(value)
        if attr == "weight":
            vgg[f"conv{ci}_kernel"] = v.transpose(2, 3, 1, 0)
        elif attr == "bias":
            vgg[f"conv{ci}_bias"] = v
    params: Dict[str, Any] = {"vgg": vgg}
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in lin_sd:
                params[f"lin{k}"] = _np(lin_sd[key]).reshape(-1)
                break
        else:
            raise KeyError(f"lin{k} weight missing from lpips state_dict")
    return params
