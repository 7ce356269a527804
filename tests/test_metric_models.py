"""Parity tests for the native metric backbones (FID InceptionV3,
LPIPS-VGG16, OpenFace) against plain-torch oracles.

The reference scores FID with pytorch-fid's InceptionV3
(metrics/pytorch_fid/inception.py), LPIPS with the lpips package
(metrics/cmp_lpips.py:24), and AED with a vendored OpenFace torch port
(metrics/OpenFacePytorch/loadOpenFace.py). torchvision/lpips aren't
installed here, so each oracle is built from plain torch.nn following the
same architecture, random-initialized; the converter maps its state_dict
to flax and outputs must match.
"""
from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as TF

pytestmark = pytest.mark.slow  # heavy tier


# ---------------------------------------------------------------------------
# FID InceptionV3 oracle (plain-torch mirror of pytorch_fid/inception.py)
# ---------------------------------------------------------------------------

class BasicConv2d(tnn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return TF.relu(self.bn(self.conv(x)))


def _avg_tf(x):
    return TF.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class IncA(tnn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(i, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(i, pool_features, kernel_size=1)

    def forward(self, x):
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x), b5, bd,
                          self.branch_pool(_avg_tf(x))], 1)


class IncB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = BasicConv2d(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd, TF.max_pool2d(x, 3, 2)], 1)


class IncC(tnn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg_tf(x))], 1)


class IncD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3,
                  self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([b3, b7, TF.max_pool2d(x, 3, 2)], 1)


class IncE(tnn.Module):
    def __init__(self, i, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BasicConv2d(i, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(i, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        pooled = (TF.max_pool2d(x, 3, 1, 1) if self.pool == "max"
                  else _avg_tf(x))
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(pooled)], 1)


class TorchFIDInception(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280, "avg")
        self.Mixed_7c = IncE(2048, "max")

    def forward(self, x):
        outs = []
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = TF.max_pool2d(x, 3, 2)
        outs.append(x)
        x = TF.max_pool2d(self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x)), 3, 2)
        outs.append(x)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                  self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                  self.Mixed_6d, self.Mixed_6e):
            x = m(x)
        outs.append(x)
        for m in (self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        outs.append(TF.adaptive_avg_pool2d(x, (1, 1)))
        return outs


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(n).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                rng.rand(n).astype(np.float32) + 0.5))
            m.weight.copy_(torch.from_numpy(
                rng.rand(n).astype(np.float32) + 0.5))
            m.bias.copy_(torch.from_numpy(
                rng.randn(n).astype(np.float32) * 0.1))


def test_fid_inception_parity():
    from synergize_motion_appearance_tpu.metrics.inception import (
        FIDInceptionV3, convert_torch_inception)

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    oracle = TorchFIDInception().eval()
    with torch.no_grad():
        _randomize_bn_stats(oracle, rng)
    params = convert_torch_inception(oracle.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x = rng.rand(1, 299, 299, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        outs_t = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
    outs_j = FIDInceptionV3(output_blocks=(0, 1, 2, 3)).apply(
        {"params": params}, jnp.asarray(x))
    assert len(outs_j) == 4
    for oj, ot in zip(outs_j, outs_t):
        ot = ot.permute(0, 2, 3, 1).numpy()
        assert oj.shape == ot.shape, (oj.shape, ot.shape)
        np.testing.assert_allclose(np.asarray(oj), ot, rtol=1e-2, atol=5e-3)


# ---------------------------------------------------------------------------
# LPIPS oracle (plain-torch mirror of lpips.LPIPS(net='vgg'))
# ---------------------------------------------------------------------------

def _lpips_mirror():
    """Random-weight plain-torch mirror of lpips.LPIPS(net='vgg') plus the
    matching converted flax params. Returns (torch_lpips_fn, params,
    lin_sd) where torch_lpips_fn takes NHWC numpy arrays in the lpips
    input domain ([-1,1]-style, pre-ScalingLayer)."""
    from synergize_motion_appearance_tpu.metrics.lpips_jax import (
        convert_lpips_weights)

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU())
            in_ch = v
    torch.manual_seed(1)
    features = tnn.Sequential(*layers).eval()
    rng = np.random.RandomState(1)
    lin_sd = {f"lin{k}.model.1.weight": torch.from_numpy(
        rng.rand(1, c, 1, 1).astype(np.float32))
        for k, c in enumerate([64, 128, 256, 512, 512])}

    params = convert_lpips_weights(
        {f"features.{k}": v for k, v in features.state_dict().items()},
        lin_sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # torch oracle forward (lpips protocol)
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    taps = [3, 8, 15, 22, 29]  # relu indices in `features`

    def feats(v):
        h = (torch.from_numpy(np.asarray(v)).permute(0, 3, 1, 2)
             - shift) / scale
        out = []
        for i, m in enumerate(features):
            h = m(h)
            if i in taps:
                out.append(h)
        return out

    def unit(t):
        return t / (torch.sqrt((t ** 2).sum(1, keepdim=True)) + 1e-10)

    def torch_lpips(x, y):
        with torch.no_grad():
            dist = 0.0
            for k, (a, b) in enumerate(zip(feats(x), feats(y))):
                d = (unit(a) - unit(b)) ** 2
                w = lin_sd[f"lin{k}.model.1.weight"]
                dist = dist + TF.conv2d(d, w).mean(dim=(2, 3)).squeeze(1)
        return dist.numpy()

    return torch_lpips, params, lin_sd


def test_lpips_vgg_parity():
    from synergize_motion_appearance_tpu.metrics.lpips_jax import LPIPSVgg

    torch_lpips, params, _ = _lpips_mirror()
    rng = np.random.RandomState(7)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    y = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1

    dist_t = torch_lpips(x, y)
    dist_j = LPIPSVgg().apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(dist_j), dist_t,
                               rtol=1e-3, atol=1e-5)


def test_lpips_loss_reference_chain(tmp_path, monkeypatch):
    """LPIPSLoss parity vs the reference loss module (losses.py:389-415):
    optional range_norm, then use_input_norm's ImageNet normalization,
    then lpips(normalize=False) — the quirky double normalization must
    survive end-to-end through the registry-built loss."""
    from synergize_motion_appearance_tpu.losses import build_loss
    from synergize_motion_appearance_tpu.metrics.external import (
        flatten_params)

    torch_lpips, params, _ = _lpips_mirror()
    np_params = jax.tree_util.tree_map(np.asarray, params)
    wfile = tmp_path / "lpips_vgg.npz"
    np.savez(wfile, **flatten_params(np_params))
    monkeypatch.setenv("SAMT_LPIPS_WEIGHTS", str(wfile))

    rng = np.random.RandomState(3)
    pred = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    target = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 1, 1, 3)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 1, 1, 3)

    for use_input_norm in (True, False):
        for range_norm in (True, False):
            loss = build_loss(dict(type="LPIPSLoss", loss_weight=1.5,
                                   use_input_norm=use_input_norm,
                                   range_norm=range_norm))
            got = float(loss(jnp.asarray(pred), jnp.asarray(target)))

            p, t = pred, target
            if range_norm:
                p, t = (p + 1) / 2, (t + 1) / 2
            if use_input_norm:
                p, t = (p - mean) / std, (t - mean) / std
            want = 1.5 * float(np.mean(torch_lpips(p, t)))
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# OpenFace oracle (plain-torch mirror of loadOpenFace.py:62-222)
# ---------------------------------------------------------------------------

class TorchOFInception(tnn.Module):
    def __init__(self, inputSize, kernelSize, kernelStride, outputSize,
                 reduceSize, pool):
        super().__init__()
        seqs = []
        for i in range(len(kernelSize)):
            od = OrderedDict()
            od["1_conv"] = tnn.Conv2d(inputSize, reduceSize[i], 1)
            od["2_bn"] = tnn.BatchNorm2d(reduceSize[i])
            od["3_relu"] = tnn.ReLU()
            pad = int(np.floor(kernelSize[i] / 2))
            od["4_conv"] = tnn.Conv2d(reduceSize[i], outputSize[i],
                                      kernelSize[i], kernelStride[i], pad)
            od["5_bn"] = tnn.BatchNorm2d(outputSize[i])
            od["6_relu"] = tnn.ReLU()
            seqs.append(tnn.Sequential(od))
        ii = len(kernelSize)
        od = OrderedDict()
        od["1_pool"] = pool
        if ii < len(reduceSize) and reduceSize[ii] is not None:
            od["2_conv"] = tnn.Conv2d(inputSize, reduceSize[ii], 1)
            od["3_bn"] = tnn.BatchNorm2d(reduceSize[ii])
            od["4_relu"] = tnn.ReLU()
        seqs.append(tnn.Sequential(od))
        ii += 1
        if ii < len(reduceSize) and reduceSize[ii] is not None:
            od = OrderedDict()
            od["1_conv"] = tnn.Conv2d(inputSize, reduceSize[ii], 1)
            od["2_bn"] = tnn.BatchNorm2d(reduceSize[ii])
            od["3_relu"] = tnn.ReLU()
            seqs.append(tnn.Sequential(od))
        self.seq_list = tnn.ModuleList(seqs)

    def forward(self, x):
        ys = [seq(x) for seq in self.seq_list]
        th = max(y.shape[2] for y in ys)
        tw = max(y.shape[3] for y in ys)
        padded = []
        for y in ys:
            pl = (tw - y.shape[3]) // 2
            pt = (th - y.shape[2]) // 2
            padded.append(TF.pad(y, (pl, tw - y.shape[3] - pl,
                                     pt, th - y.shape[2] - pt)))
        return torch.cat(padded, 1)


class TorchOpenFace(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layer1 = tnn.Conv2d(3, 64, 7, 2, 3)
        self.layer2 = tnn.BatchNorm2d(64)
        self.layer3 = tnn.ReLU()
        self.layer4 = tnn.MaxPool2d(3, 2, 1)
        self.layer5 = tnn.LocalResponseNorm(5, 0.0001, 0.75, 1.0)
        self.layer6 = tnn.Conv2d(64, 64, 1, 1, 0)
        self.layer7 = tnn.BatchNorm2d(64)
        self.layer8 = tnn.ReLU()
        self.layer9 = tnn.Conv2d(64, 192, 3, 1, 1)
        self.layer10 = tnn.BatchNorm2d(192)
        self.layer11 = tnn.ReLU()
        self.layer12 = tnn.LocalResponseNorm(5, 0.0001, 0.75, 1.0)
        self.layer13 = tnn.MaxPool2d(3, 2, 1)
        self.layer14 = TorchOFInception(
            192, (3, 5), (1, 1), (128, 32), (96, 16, 32, 64),
            tnn.MaxPool2d(3, 2, 0))
        self.layer15 = TorchOFInception(
            256, (3, 5), (1, 1), (128, 64), (96, 32, 64, 64),
            tnn.LPPool2d(2, 3, 3))
        self.layer16 = TorchOFInception(
            320, (3, 5), (2, 2), (256, 64), (128, 32, None, None),
            tnn.MaxPool2d(3, 2, 0))
        self.layer17 = TorchOFInception(
            640, (3, 5), (1, 1), (192, 64), (96, 32, 128, 256),
            tnn.LPPool2d(2, 3, 3))
        self.layer18 = TorchOFInception(
            640, (3, 5), (2, 2), (256, 128), (160, 64, None, None),
            tnn.MaxPool2d(3, 2, 0))
        self.layer19 = TorchOFInception(
            1024, (3,), (1,), (384,), (96, 96, 256), tnn.LPPool2d(2, 3, 3))
        self.layer21 = TorchOFInception(
            736, (3,), (1,), (384,), (96, 96, 256), tnn.MaxPool2d(3, 2, 0))
        self.layer22 = tnn.AvgPool2d(3, 1, 0)
        self.layer25 = tnn.Linear(736, 128)

    def forward(self, x):
        x = self.layer8(self.layer7(self.layer6(self.layer5(
            self.layer4(self.layer3(self.layer2(self.layer1(x))))))))
        x = self.layer13(self.layer12(self.layer11(self.layer10(
            self.layer9(x)))))
        for m in (self.layer14, self.layer15, self.layer16, self.layer17,
                  self.layer18, self.layer19, self.layer21):
            x = m(x)
        x = self.layer22(x).view(-1, 736)
        x = self.layer25(x)
        norm = torch.sqrt((x ** 2).sum(1) + 1e-6)
        return x / norm.view(-1, 1)


def test_openface_parity():
    from synergize_motion_appearance_tpu.metrics.openface import (
        OpenFaceNet, convert_openface_weights)

    torch.manual_seed(2)
    rng = np.random.RandomState(2)
    oracle = TorchOpenFace().eval()
    with torch.no_grad():
        _randomize_bn_stats(oracle, rng)
    params = convert_openface_weights(oracle.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x = rng.rand(2, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        emb_t = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    emb_j, feats736 = OpenFaceNet().apply({"params": params},
                                          jnp.asarray(x))
    assert emb_j.shape == (2, 128) and feats736.shape == (2, 736)
    np.testing.assert_allclose(np.asarray(emb_j), emb_t,
                               rtol=1e-3, atol=1e-4)
    # l2-normalized
    np.testing.assert_allclose(
        np.sum(np.square(np.asarray(emb_j)), axis=1), 1.0, atol=1e-4)
