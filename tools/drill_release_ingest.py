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

  fabricate --> convert (3 nets + 3 metric bundles + vgg19 loss net)
            --> load through demo.build_and_load (the demo/test.py path)
            --> converted-tensor spot checks vs the torch state_dicts
            --> metric battery (FID / LPIPS / AED) on synthetic frame
                dirs produces non-degenerate, finite scores

Usage:
  python tools/drill_release_ingest.py --dir /tmp/samt_release_drill
  # when real released weights exist: drop the .pth files (same names)
  # into DIR and skip fabrication:
  python tools/drill_release_ingest.py --dir DIR --no-fabricate

Everything downstream of fabrication is byte-for-byte the path real
released weights take; docs/RELEASE_WEIGHTS.md documents what to drop
where.
"""
import argparse
import json
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
# ingest: the exact path real released weights take
# --------------------------------------------------------------------------

def ingest(bundle_dir: str, out_dir: str, skip_nets: bool = False):
    """convert the .pth bundle -> .npz checkpoints + SAMT_WEIGHTS_DIR."""
    from convert_reference_checkpoint import (
        convert_motion_estimator, convert_net_d, convert_net_g,
        load_torch_state_dict, save_npz)
    from synergize_motion_appearance_tpu.utils.options import load_yaml

    os.makedirs(out_dir, exist_ok=True)
    cfg = load_yaml(osp.join(ROOT, "options", "train.yml"))

    # --- the three networks ---
    for key in () if skip_nets else ("params", "params_ema"):
        sd = load_torch_state_dict(
            osp.join(bundle_dir, NET_FILES["g"]), key)
        variables, unused = convert_net_g(sd, dict(cfg["network_g"]))
        assert unused == [], f"net_g[{key}] unconverted: {unused[:8]}"
        save_npz(variables, osp.join(out_dir, f"net_g_{key}.npz"))
    if not skip_nets:
        me = cfg["network_motion_estimator"]
        sd = load_torch_state_dict(
            osp.join(bundle_dir, NET_FILES["motion_estimator"]),
            "params")
        variables, unused = convert_motion_estimator(
            sd,
            num_blocks_kp=me["kp_detector_params"]["num_blocks"],
            num_blocks_dm=me["dense_motion_params"]["num_blocks"],
            multi_mask=me["dense_motion_params"].get("multi_mask",
                                                     False),
            occlusion_num=me["dense_motion_params"].get("occlusion_num",
                                                        5),
            scale_factor=me["dense_motion_params"].get("scale_factor",
                                                       0.25))
        assert unused == [], f"net_me unconverted: {unused[:8]}"
        save_npz(variables,
                 osp.join(out_dir, "net_motion_estimator.npz"))
        sd = load_torch_state_dict(osp.join(bundle_dir, NET_FILES["d"]),
                                   "params")
        variables, unused = convert_net_d(
            sd, cfg["network_d"].get("n_layers", 4))
        assert unused == [], f"net_d unconverted: {unused[:8]}"
        save_npz(variables, osp.join(out_dir, "net_d.npz"))

    # --- metric backbones -> the names external.py searches ---
    import torch

    from synergize_motion_appearance_tpu.metrics.external import (
        flatten_params)
    from synergize_motion_appearance_tpu.metrics.inception import (
        convert_torch_inception)
    from synergize_motion_appearance_tpu.metrics.lpips_jax import (
        convert_lpips_weights)
    from synergize_motion_appearance_tpu.metrics.openface import (
        convert_openface_weights)

    def _load(name):
        return torch.load(osp.join(bundle_dir, name), map_location="cpu",
                          weights_only=True)

    np.savez(osp.join(out_dir, "inception.npz"), **flatten_params(
        convert_torch_inception(_load(INCEPTION_FILE))))
    np.savez(osp.join(out_dir, "lpips_vgg.npz"), **flatten_params(
        convert_lpips_weights(_load("vgg16.pth"),
                              _load("lpips_lins.pth"))))
    np.savez(osp.join(out_dir, "openface.npz"), **flatten_params(
        convert_openface_weights(_load("openface.pth"))))
    # vgg19 for the training perceptual/style losses
    from convert_vgg_weights import save_npz as save_vgg_npz
    from convert_vgg_weights import torch_vgg_to_flax

    save_vgg_npz(torch_vgg_to_flax(
        {k: v.numpy() for k, v in _load("vgg19.pth").items()}),
        osp.join(out_dir, "vgg19_flax.npz"))

    print(f"converted everything into {out_dir}")


# --------------------------------------------------------------------------
# validation
# --------------------------------------------------------------------------

def roundtrip_check(bundle_dir: str, out_dir: str):
    """Reverse-export every converted net back to a reference-named
    state_dict and compare EVERY tensor to the fabricated original —
    validates all leaves of all three nets through the file path with
    zero name guessing. (Forward-parity at the activation level is
    tools/validate_reference_parity.py, proven in round 3.)"""
    from convert_reference_checkpoint import (
        export_motion_estimator, export_net_d, export_net_g,
        load_torch_state_dict)
    from convert_vgg_weights import load_npz
    from synergize_motion_appearance_tpu.utils.options import load_yaml

    cfg = load_yaml(osp.join(ROOT, "options", "train.yml"))
    me = cfg["network_motion_estimator"]
    cases = [
        ("net_g_params_ema.npz", NET_FILES["g"], "params_ema",
         lambda v: export_net_g(v, dict(cfg["network_g"]))),
        ("net_g_params.npz", NET_FILES["g"], "params",
         lambda v: export_net_g(v, dict(cfg["network_g"]))),
        ("net_motion_estimator.npz", NET_FILES["motion_estimator"],
         "params",
         lambda v: export_motion_estimator(
             v,
             num_blocks_kp=me["kp_detector_params"]["num_blocks"],
             num_blocks_dm=me["dense_motion_params"]["num_blocks"],
             multi_mask=me["dense_motion_params"].get("multi_mask",
                                                      False),
             occlusion_num=me["dense_motion_params"].get("occlusion_num",
                                                         5),
             scale_factor=me["dense_motion_params"].get("scale_factor",
                                                        0.25))),
        ("net_d.npz", NET_FILES["d"], "params",
         lambda v: export_net_d(v, cfg["network_d"].get("n_layers", 4))),
    ]
    for npz_name, pth_name, key, export in cases:
        variables = load_npz(osp.join(out_dir, npz_name))
        back = export(variables)
        orig = load_torch_state_dict(osp.join(bundle_dir, pth_name), key)
        missing = sorted(set(orig) - set(back))
        extra = sorted(set(back) - set(orig))
        assert not missing and not extra, (npz_name, missing[:5],
                                           extra[:5])
        for k in orig:
            if k.endswith("down.weight"):
                # recomputed antialias gaussian buffers: numpy exp vs
                # torch exp may differ in the last ulp
                np.testing.assert_allclose(
                    np.asarray(back[k]), orig[k], rtol=0, atol=1e-7,
                    err_msg=f"{npz_name}:{k}")
            else:
                np.testing.assert_array_equal(
                    np.asarray(back[k]), orig[k],
                    err_msg=f"{npz_name}:{k}")
        print(f"round-trip exact: {npz_name} ({len(orig)} tensors) "
              f"== {pth_name}[{key}]")
    # params_ema independence: the drill bundle fabricates DISTINCT ema
    # weights, so key selection is actually proven
    a = load_npz(osp.join(out_dir, "net_g_params.npz"))
    b = load_npz(osp.join(out_dir, "net_g_params_ema.npz"))
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert any(not np.array_equal(x, y) for x, y in zip(la, lb)), (
        "params and params_ema should differ in the drill bundle")
    print("params vs params_ema: distinct (key selection proven)")


def load_via_demo(out_dir: str):
    """The demo/test.py load path accepts the converted files."""
    from synergize_motion_appearance_tpu.demo import build_and_load
    from synergize_motion_appearance_tpu.utils.options import load_yaml

    cfg = load_yaml(osp.join(ROOT, "options", "train.yml"))
    cfg = dict(cfg)
    cfg["path"] = {
        "pretrain_network_g": osp.join(out_dir, "net_g_params_ema.npz"),
        "pretrain_network_motion_estimator": osp.join(
            out_dir, "net_motion_estimator.npz"),
        "param_key_g": "params",  # npz already holds the selected key
    }
    net_g, me, g_vars, m_vars = build_and_load(cfg)
    assert "batch_stats" in m_vars, (
        "motion estimator BN running stats must ride along")
    n_leaves = len(jax_leaves(g_vars["params"]))
    print(f"demo.build_and_load loaded converted weights "
          f"({n_leaves} generator param leaves)")
    return net_g, me, g_vars, m_vars


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def battery(out_dir: str, work_dir: str):
    """FID / LPIPS / AED on two synthetic frame dirs with the converted
    metric weights — scores must be finite, non-degenerate, and ordered
    (identical dirs score better than shifted dirs)."""
    os.environ["SAMT_WEIGHTS_DIR"] = out_dir
    import cv2

    from synergize_motion_appearance_tpu.metrics.external import (
        calculate_aed, calculate_fid, calculate_lpips)

    rng = np.random.RandomState(3)
    d_gt = osp.join(work_dir, "gt")
    d_same = osp.join(work_dir, "same")
    d_shift = osp.join(work_dir, "shift")
    for d in (d_gt, d_same, d_shift):
        os.makedirs(d, exist_ok=True)
    # smooth random images (pure noise saturates perceptual nets)
    for i in range(8):
        base = rng.rand(32, 32, 3)
        img = cv2.resize((base * 255).astype(np.uint8), (256, 256),
                         interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(osp.join(d_gt, f"{i:04d}.png"), img)
        cv2.imwrite(osp.join(d_same, f"{i:04d}.png"), img)
        cv2.imwrite(osp.join(d_shift, f"{i:04d}.png"),
                    np.roll(img, 40, axis=1))

    fid_same = calculate_fid([d_gt, d_same])
    fid_shift = calculate_fid([d_gt, d_shift])
    lp_same = calculate_lpips(d_gt, d_same)
    lp_shift = calculate_lpips(d_gt, d_shift)
    aed_same = calculate_aed(d_gt, d_same)
    aed_shift = calculate_aed(d_gt, d_shift)
    scores = dict(fid_same=fid_same, fid_shift=fid_shift,
                  lpips_same=lp_same, lpips_shift=lp_shift,
                  aed_same=aed_same, aed_shift=aed_shift)
    print("battery:", json.dumps(
        {k: round(float(v), 5) for k, v in scores.items()}))
    for k, v in scores.items():
        assert np.isfinite(v), f"{k} not finite"
    # non-degenerate: identical dirs ~0, shifted dirs strictly worse
    assert lp_same < 1e-5 and lp_shift > 1e-2, (lp_same, lp_shift)
    assert abs(fid_same) < 1e-3 and fid_shift > 1e-2, (fid_same,
                                                       fid_shift)
    # OpenFace embeddings are norm-bounded, so random-weight distances
    # are small in absolute terms; 1e-4 is ~4 orders above the
    # degenerate default-init case (1e-8) and strictly ordered vs 0
    assert aed_same < 1e-6 and aed_shift > 1e-4, (aed_same, aed_shift)
    print("battery non-degenerate: same-dir ~0, shifted dirs strictly "
          "worse on all three metrics")


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

    out_dir = osp.join(args.dir, "converted")
    if not args.no_fabricate:
        fabricate(args.dir, skip_nets=args.skip_nets)
    ingest(args.dir, out_dir, skip_nets=args.skip_nets)
    if not args.skip_nets:
        roundtrip_check(args.dir, out_dir)
        load_via_demo(out_dir)
    if not args.skip_battery:
        battery(out_dir, osp.join(args.dir, "battery_work"))
    print("RELEASE INGEST DRILL PASSED" +
          (" (metric backbones only)" if args.skip_nets else ""))


if __name__ == "__main__":
    main()
