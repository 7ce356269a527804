#!/usr/bin/env python
"""Drill the released-weights ingest path with a fabricated release bundle.

The reference's product is its released checkpoints
(/root/reference/README.md:41-55): `net_g_*.pth` / `net_d_*.pth` /
`net_motion_estimator_*.pth` torch bundles in base_model.py:170-200's
save layout ({'params': sd[, 'params_ema': sd]}), plus the metric
backbones its battery downloads (pt_inception-2015-12-05-6726825d.pth
from pytorch-fid, torchvision vgg16 + lpips v0.1 lin heads,
openface.pth from OpenFacePytorch). This image has no egress, so this
tool FABRICATES a bundle in exactly those file formats (reference torch
archs instantiated from the oracle, random-init, torch.save'd), then
runs the full ingest a real user would run:

  fabricate --> tools/ingest_release.run(): convert (3 nets + 3 metric
            bundles + vgg19 loss net) --> round-trip-verify every
            tensor --> load through demo.build_and_load (the demo/
            test.py path) --> metric battery (FID / LPIPS / AED) on
            synthetic frame dirs produces non-degenerate, finite scores

Usage:
  python tools/drill_release_ingest.py --dir /tmp/samt_release_drill
  # when REAL released weights exist, use the first-class entry point
  # the drill itself drives (same code path, no fabrication):
  python tools/ingest_release.py --weights DIR [--data VIDEOS_DIR]

Everything downstream of fabrication IS tools/ingest_release.py — the
drill imports and calls its `run()`, so the drill passing proves the
real-weights command works; docs/RELEASE_WEIGHTS.md documents what to
drop where.
"""
import argparse
import os
import sys
from os import path as osp

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, "tests"))
sys.path.insert(0, osp.join(ROOT, "tools"))

import numpy as np  # noqa: E402

NET_FILES = {
    "g": "net_g_latest.pth",
    "d": "net_d_latest.pth",
    "motion_estimator": "net_motion_estimator_latest.pth",
}
INCEPTION_FILE = "pt_inception-2015-12-05-6726825d.pth"


# --------------------------------------------------------------------------
# fabrication: reference torch archs + released metric-backbone formats
# --------------------------------------------------------------------------

def _reference_nets():
    """Reference torch nets at flagship config (same ctor args as
    tools/validate_reference_parity.py)."""
    import torch

    from _reference_oracle import import_reference
    import_reference()

    from basicsr.archs.appmotioncodebook_arch import (
        AppMotionCompFormer as TorchFormer,
    )
    from basicsr.archs.motion_estimator_arch import (
        Motion_Estimator_keypoint_aware,
    )
    from basicsr.archs.vqgan_arch import VQGANDiscriminator

    common = dict(num_kp=15, num_channels=3)
    kp_params = dict(temperature=0.1, block_expansion=32,
                     max_features=1024, scale_factor=0.25, num_blocks=5,
                     estimate_jacobian=True)
    dm_params = dict(block_expansion=64, max_features=1024, num_blocks=5,
                     scale_factor=0.25, estimate_occlusion_map=True)

    torch.manual_seed(0)
    t_me = Motion_Estimator_keypoint_aware(
        common_params=common, dense_motion_params=dm_params,
        kp_detector_params=kp_params)
    t_g = TorchFormer()
    t_d = VQGANDiscriminator(nc=3, ndf=64, n_layers=4)
    # a SECOND generator as the EMA weights: distinct values so the
    # drill proves param_key selection really picks params_ema
    torch.manual_seed(123)
    t_g_ema = TorchFormer()
    return t_me, t_g, t_g_ema, t_d


def _sd(net):
    return {k: v.cpu() for k, v in net.state_dict().items()}


def _fabricate_inception_sd():
    """pt_inception-format state_dict fabricated by reversing our flax
    FIDInceptionV3 tree (convert_torch_inception's mapping is
    path-preserving: torch `X.Y.conv.weight` <-> flax [X][Y]['kernel'],
    `X.Y.bn.{weight,bias,running_*}` <-> bn_{scale,bias,mean,var}).
    Shapes come from jax.eval_shape — no compute. fc/AuxLogits entries
    are included like the real file (the converter drops them)."""
    import jax
    import jax.numpy as jnp
    import torch

    from synergize_motion_appearance_tpu.metrics.inception import (
        FIDInceptionV3)

    model = FIDInceptionV3()
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 299, 299, 3)))["params"]
    rng = np.random.RandomState(7)
    sd = {}

    def walk(node, path):
        if "kernel" in node:
            k = node["kernel"].shape  # HWIO
            # He-normal: variance-preserving through the 90+ conv/bn
            # stages so the fabricated net still DISCRIMINATES inputs
            # (flat 0.1*randn decays activations to ~0 by the pool head
            # and every image maps to the same feature -> degenerate
            # FID; measured in the drill's first run)
            fan_in = k[0] * k[1] * k[2]
            std = float(np.sqrt(2.0 / fan_in))
            sd[".".join(path + ["conv", "weight"])] = torch.from_numpy(
                (std * rng.randn(k[3], k[2], k[0], k[1])).astype(
                    np.float32))
            f = node["bn_scale"].shape[0]
            for torch_attr, v in (
                    ("weight",
                     (1.0 + 0.1 * rng.randn(f)).astype(np.float32)),
                    ("bias", (0.05 * rng.randn(f)).astype(np.float32)),
                    ("running_mean",
                     (0.05 * rng.randn(f)).astype(np.float32)),
                    ("running_var",
                     (1.0 + 0.1 * rng.rand(f)).astype(np.float32))):
                sd[".".join(path + ["bn", torch_attr])] = (
                    torch.from_numpy(v))
            sd[".".join(path + ["bn", "num_batches_tracked"])] = (
                torch.tensor(0))
            return
        for name, child in node.items():
            walk(child, path + [name])

    walk(shapes, [])
    # classifier head + aux head, present in the released file, unused
    # by FID (inception.py:116-124 drops them)
    sd["fc.weight"] = torch.from_numpy(
        (0.01 * rng.randn(1008, 2048)).astype(np.float32))
    sd["fc.bias"] = torch.zeros(1008)
    sd["AuxLogits.conv0.conv.weight"] = torch.from_numpy(
        (0.1 * rng.randn(128, 768, 1, 1)).astype(np.float32))
    return sd


def _fabricate_vgg16_lpips():
    """torchvision-format vgg16 features state_dict + lpips v0.1 lin
    heads (`linK.model.1.weight`, (1,C,1,1))."""
    import torch

    from synergize_motion_appearance_tpu.metrics.lpips_jax import (
        _VGG16_CFG)

    rng = np.random.RandomState(11)
    vgg_sd = {}
    in_ch, idx = 3, 0
    for item in _VGG16_CFG:
        if item == "M":
            idx += 1
            continue
        vgg_sd[f"features.{idx}.weight"] = torch.from_numpy(
            (0.1 * rng.randn(item, in_ch, 3, 3)).astype(np.float32))
        vgg_sd[f"features.{idx}.bias"] = torch.from_numpy(
            (0.01 * rng.randn(item)).astype(np.float32))
        in_ch = item
        idx += 2  # conv + relu
    lin_sd = {}
    for i, c in enumerate([64, 128, 256, 512, 512]):
        lin_sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.randn(1, c, 1, 1)).astype(np.float32))
    return vgg_sd, lin_sd


def _fabricate_vgg19():
    """torchvision-format vgg19 state_dict (the training perceptual /
    style losses' backbone; convert_vgg_weights.py ingests it)."""
    import torch

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    rng = np.random.RandomState(13)
    sd = {}
    in_ch, idx = 3, 0
    for item in cfg:
        if item == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            (0.1 * rng.randn(item, in_ch, 3, 3)).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            (0.01 * rng.randn(item)).astype(np.float32))
        in_ch = item
        idx += 2
    return sd


def fabricate(bundle_dir: str, skip_nets: bool = False):
    import torch

    os.makedirs(bundle_dir, exist_ok=True)
    if not skip_nets:
        t_me, t_g, t_g_ema, t_d = _reference_nets()
        # base_model.py:170-200: save_dict[param_key] = state_dict;
        # net_g is saved with the ['params', 'params_ema'] dual key
        torch.save({"params": _sd(t_g), "params_ema": _sd(t_g_ema)},
                   osp.join(bundle_dir, NET_FILES["g"]))
        torch.save({"params": _sd(t_d)},
                   osp.join(bundle_dir, NET_FILES["d"]))
        torch.save({"params": _sd(t_me)},
                   osp.join(bundle_dir, NET_FILES["motion_estimator"]))

    # metric backbones, released formats
    from loadOpenFace import netOpenFace  # via oracle sys.path (below)

    of = netOpenFace(False)
    # torch's default kaiming_uniform(a=sqrt(5)) decays signal over the
    # ~25 conv stages -> near-constant embeddings (AED ~1e-8 in the
    # drill's first run); re-init variance-preserving so the fabricated
    # net discriminates. File format unchanged (module state_dict).
    torch.manual_seed(31)
    for m in of.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.Linear)):
            torch.nn.init.kaiming_normal_(
                m.weight, nonlinearity="relu")
            if m.bias is not None:
                torch.nn.init.zeros_(m.bias)
    torch.save(of.state_dict(), osp.join(bundle_dir, "openface.pth"))
    torch.save(_fabricate_inception_sd(),
               osp.join(bundle_dir, INCEPTION_FILE))
    vgg16_sd, lin_sd = _fabricate_vgg16_lpips()
    torch.save(vgg16_sd, osp.join(bundle_dir, "vgg16.pth"))
    torch.save(lin_sd, osp.join(bundle_dir, "lpips_lins.pth"))
    torch.save(_fabricate_vgg19(), osp.join(bundle_dir, "vgg19.pth"))
    print(f"fabricated release bundle at {bundle_dir}:")
    for f in sorted(os.listdir(bundle_dir)):
        print(f"  {f}  ({osp.getsize(osp.join(bundle_dir, f)) >> 20} MB)")


# --------------------------------------------------------------------------
# everything downstream of fabrication lives in tools/ingest_release.py —
# the SAME entry point real released weights take
# (`python tools/ingest_release.py --weights DIR`); the drill only
# fabricates the bundle and then drives that module.
# --------------------------------------------------------------------------

from ingest_release import run as ingest_run  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/samt_release_drill",
                    help="bundle directory (fabricated or real release)")
    ap.add_argument("--no-fabricate", action="store_true",
                    help="DIR already holds a real release bundle")
    ap.add_argument("--skip-battery", action="store_true")
    ap.add_argument("--skip-nets", action="store_true",
                    help="metric backbones + battery only (fast "
                         "iteration; skips the 3 networks)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms",
                      os.environ.get("JAX_PLATFORMS", "cpu"))

    # the vendored OpenFacePytorch dir must be importable for fabrication
    sys.path.insert(0, "/root/reference/basicsr/metrics/OpenFacePytorch")

    if not args.no_fabricate:
        fabricate(args.dir, skip_nets=args.skip_nets)
    ingest_run(args.dir, osp.join(args.dir, "converted"),
               skip_battery=args.skip_battery, skip_nets=args.skip_nets)
    print("RELEASE INGEST DRILL PASSED" +
          (" (metric backbones only)" if args.skip_nets else ""))


if __name__ == "__main__":
    main()
