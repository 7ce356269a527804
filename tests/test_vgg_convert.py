"""VGG19 conversion parity: random torch vgg19 -> flax, feature match."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy tier

torch = pytest.importorskip("torch")


def test_vgg19_feature_parity():
    import sys
    from os import path as osp

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools"))
    from convert_vgg_weights import torch_vgg_to_flax

    from synergize_motion_appearance_tpu.models.vgg import VGG19Features

    # torchvision isn't installed here; build the identical vgg19.features
    # stack by hand (cfg 'E': 64,64,M,128,128,M,256x4,M,512x4,M,512x4,M)
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v

    class TV(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)

    torch.manual_seed(0)
    tnet = TV().eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_vgg_to_flax(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32) * 0.5

    # flax forward
    net = VGG19Features()
    outs_j = net.apply({"params": params}, jnp.asarray(x))

    # torch forward reproducing the 5-slice protocol (vgg_arch.py:179-207)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xt = (torch.from_numpy(x).permute(0, 3, 1, 2) - mean) / std
    feats = tnet.features
    slices = [(0, 2), (2, 7), (7, 12), (12, 21), (21, 30)]
    outs_t = []
    h = xt
    with torch.no_grad():
        for lo, hi in slices:
            for i in range(lo, hi):
                h = feats[i](h)
            outs_t.append(h.permute(0, 2, 3, 1).numpy())

    assert len(outs_j) == 5
    for oj, ot in zip(outs_j, outs_t):
        assert oj.shape == ot.shape
        np.testing.assert_allclose(np.asarray(oj), ot, rtol=2e-3, atol=2e-4)
