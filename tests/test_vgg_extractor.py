"""Parity test for the named-layer VGGFeatureExtractor vs a torch oracle
built from the same weights (reference archs/vgg_arch.py:57-164)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

pytestmark = pytest.mark.slow  # heavy tier

from synergize_motion_appearance_tpu.models.vgg import (  # noqa: E402
    VGGFeatureExtractor, _VGG_NAMES, _BLOCK_CHANNELS)


def _torch_oracle(params, names, layer_list, x_nchw, use_input_norm=True,
                  range_norm=False, remove_pooling=False, pooling_stride=2):
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = x_nchw
    if range_norm:
        x = (x + 1) / 2
    if use_input_norm:
        x = (x - mean) / std
    max_idx = max(names.index(v) for v in layer_list)
    out = {}
    for name in names[:max_idx + 1]:
        if name.startswith("conv"):
            p = params[name]
            w = torch.from_numpy(
                np.asarray(p["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
            ).float()
            b = torch.from_numpy(np.asarray(p["Conv_0"]["bias"])).float()
            x = tnn.functional.conv2d(x, w, b, padding=1)
        elif name.startswith("relu"):
            x = tnn.functional.relu(x)
        elif name.startswith("pool"):
            if remove_pooling:
                continue
            x = tnn.functional.max_pool2d(x, 2, stride=pooling_stride)
        if name in layer_list:
            out[name] = x
    return out


@pytest.mark.parametrize("vgg_type,layers", [
    ("vgg19", ["relu1_1", "conv3_4", "relu4_4"]),
    ("vgg16", ["relu2_2", "conv5_3"]),
])
def test_vgg_feature_extractor_parity(vgg_type, layers):
    rng = np.random.RandomState(0)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    mod = VGGFeatureExtractor(layer_name_list=layers, vgg_type=vgg_type)
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_j = mod.apply(vars_, jnp.asarray(x))

    out_t = _torch_oracle(vars_["params"], _VGG_NAMES[vgg_type], layers,
                          torch.from_numpy(x).permute(0, 3, 1, 2))
    assert set(out_j) == set(layers)
    for name in layers:
        np.testing.assert_allclose(
            np.asarray(out_j[name]),
            out_t[name].permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4)


def test_vgg_feature_extractor_options():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 16, 16, 3).astype(np.float32) * 2 - 1
    mod = VGGFeatureExtractor(layer_name_list=["relu3_1"],
                              range_norm=True, remove_pooling=True)
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(vars_, jnp.asarray(x))["relu3_1"]
    # pooling removed: spatial size preserved
    assert out.shape == (1, 16, 16, 256)

    with pytest.raises(ValueError, match="not in"):
        VGGFeatureExtractor(layer_name_list=["conv9_9"]).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
