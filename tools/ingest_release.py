#!/usr/bin/env python
"""One-command ingest of the released reference weights (+ optional real
data) — the NON-fabricated acceptance path.

The reference's product is its released checkpoints
(/root/reference/README.md:41-55): `net_g_*.pth` / `net_d_*.pth` /
`net_motion_estimator_*.pth` torch bundles in base_model.py:170-200's
save layout ({'params': sd[, 'params_ema': sd]}), plus the metric
backbones its battery uses (pt_inception-2015-12-05-6726825d.pth,
torchvision vgg16 + lpips v0.1 lin heads, openface.pth, torchvision
vgg19 for the training losses). This tool runs, in order:

  1. convert   — every .pth found in --weights into flax .npz
  2. verify    — reverse-export every converted net back to a
                 reference-named state_dict; EVERY tensor must equal the
                 original file (no name guessing survives this)
  3. load      — through demo.build_and_load, the demo/test.py path
  4. battery   — synthetic-frame FID/LPIPS/AED sanity (finite,
                 non-degenerate, ordered)
  5. [--data]  — real-data self-reenactment: generate results from real
                 videos with the ingested weights, score the reference's
                 directory battery (appmotioncomp_model.py:529-568):
                 L1/PSNR/SSIM always; FID/LPIPS/AED with the converted
                 backbones; AKD/ID/pose when their third-party models
                 are installed (the reference gates on the same deps)
  6. [--reference-results] — frame-for-frame comparison of our results
                 against reference-generated output frames (the
                 BASELINE.md LPIPS/AKD/AED *parity* acceptance row)

Usage (the day real artifacts are available):
  python tools/ingest_release.py --weights /path/to/release \
      [--data /path/to/voxceleb_test] [--reference-results /path/to/ref_out]

`tools/drill_release_ingest.py` fabricates a bundle in the released
formats and drives THIS module's pipeline — the drill and the real
ingest share every line downstream of fabrication.
"""
import argparse
import json
import os
import sys
from os import path as osp

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, "tools"))

import numpy as np  # noqa: E402

NET_FILES = {
    "g": "net_g_latest.pth",
    "d": "net_d_latest.pth",
    "motion_estimator": "net_motion_estimator_latest.pth",
}
INCEPTION_FILE = "pt_inception-2015-12-05-6726825d.pth"


def _find_net_file(bundle_dir: str, stem: str) -> str:
    """Released checkpoints may be net_g_latest.pth or net_g_<iter>.pth;
    prefer `latest`, else the highest iter."""
    exact = osp.join(bundle_dir, f"net_{stem}_latest.pth")
    if osp.exists(exact):
        return exact
    import glob
    import re

    cands = glob.glob(osp.join(bundle_dir, f"net_{stem}_*.pth"))
    if not cands:
        raise FileNotFoundError(
            f"no net_{stem}_*.pth in {bundle_dir} "
            f"(expected the base_model.py:170-200 save layout)")

    def it(p):
        m = re.search(r"_(\d+)\.pth$", p)
        return int(m.group(1)) if m else -1

    return max(cands, key=it)


# --------------------------------------------------------------------------
# step 1: convert
# --------------------------------------------------------------------------

def ingest(bundle_dir: str, out_dir: str, skip_nets: bool = False):
    """Convert the .pth bundle -> .npz checkpoints + SAMT_WEIGHTS_DIR."""
    from convert_reference_checkpoint import (
        convert_motion_estimator, convert_net_d, convert_net_g,
        load_torch_state_dict, save_npz)
    from synergize_motion_appearance_tpu.utils.options import load_yaml

    os.makedirs(out_dir, exist_ok=True)
    cfg = load_yaml(osp.join(ROOT, "options", "train.yml"))

    # --- the three networks ---
    if not skip_nets:
        g_file = _find_net_file(bundle_dir, "g")
        for key in ("params", "params_ema"):
            try:
                sd = load_torch_state_dict(g_file, key)
            except KeyError:
                if key == "params_ema":
                    print(f"  note: {osp.basename(g_file)} has no "
                          f"'params_ema' key; skipping")
                    continue
                raise
            variables, unused = convert_net_g(sd, dict(cfg["network_g"]))
            assert unused == [], f"net_g[{key}] unconverted: {unused[:8]}"
            save_npz(variables, osp.join(out_dir, f"net_g_{key}.npz"))
        me = cfg["network_motion_estimator"]
        sd = load_torch_state_dict(
            _find_net_file(bundle_dir, "motion_estimator"), "params")
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
        sd = load_torch_state_dict(_find_net_file(bundle_dir, "d"),
                                   "params")
        variables, unused = convert_net_d(
            sd, cfg["network_d"].get("n_layers", 4))
        assert unused == [], f"net_d unconverted: {unused[:8]}"
        save_npz(variables, osp.join(out_dir, "net_d.npz"))

    # --- metric backbones -> the names external.py searches ---
    # each is optional: convert what's present, report what's missing
    # (the reference gates its battery on the same artifacts)
    import torch

    from synergize_motion_appearance_tpu.metrics.external import (
        flatten_params)

    def _load(name):
        return torch.load(osp.join(bundle_dir, name), map_location="cpu",
                          weights_only=True)

    missing = []
    if osp.exists(osp.join(bundle_dir, INCEPTION_FILE)):
        from synergize_motion_appearance_tpu.metrics.inception import (
            convert_torch_inception)

        np.savez(osp.join(out_dir, "inception.npz"), **flatten_params(
            convert_torch_inception(_load(INCEPTION_FILE))))
    else:
        missing.append(INCEPTION_FILE + " (FID)")
    if (osp.exists(osp.join(bundle_dir, "vgg16.pth"))
            and osp.exists(osp.join(bundle_dir, "lpips_lins.pth"))):
        from synergize_motion_appearance_tpu.metrics.lpips_jax import (
            convert_lpips_weights)

        np.savez(osp.join(out_dir, "lpips_vgg.npz"), **flatten_params(
            convert_lpips_weights(_load("vgg16.pth"),
                                  _load("lpips_lins.pth"))))
    else:
        missing.append("vgg16.pth + lpips_lins.pth (LPIPS)")
    if osp.exists(osp.join(bundle_dir, "openface.pth")):
        from synergize_motion_appearance_tpu.metrics.openface import (
            convert_openface_weights)

        np.savez(osp.join(out_dir, "openface.npz"), **flatten_params(
            convert_openface_weights(_load("openface.pth"))))
    else:
        missing.append("openface.pth (AED)")
    if osp.exists(osp.join(bundle_dir, "vgg19.pth")):
        from convert_vgg_weights import save_npz as save_vgg_npz
        from convert_vgg_weights import torch_vgg_to_flax

        save_vgg_npz(torch_vgg_to_flax(
            {k: v.numpy() for k, v in _load("vgg19.pth").items()}),
            osp.join(out_dir, "vgg19_flax.npz"))
    else:
        missing.append("vgg19.pth (training perceptual loss)")

    print(f"converted everything present into {out_dir}")
    for m in missing:
        print(f"  missing from bundle (skipped): {m}")
    return missing


# --------------------------------------------------------------------------
# step 2: round-trip verification
# --------------------------------------------------------------------------

def roundtrip_check(bundle_dir: str, out_dir: str):
    """Reverse-export every converted net back to a reference-named
    state_dict and compare EVERY tensor to the original file —
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
        ("net_g_params_ema.npz", _find_net_file(bundle_dir, "g"),
         "params_ema",
         lambda v: export_net_g(v, dict(cfg["network_g"]))),
        ("net_g_params.npz", _find_net_file(bundle_dir, "g"), "params",
         lambda v: export_net_g(v, dict(cfg["network_g"]))),
        ("net_motion_estimator.npz",
         _find_net_file(bundle_dir, "motion_estimator"), "params",
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
        ("net_d.npz", _find_net_file(bundle_dir, "d"), "params",
         lambda v: export_net_d(v, cfg["network_d"].get("n_layers", 4))),
    ]
    for npz_name, pth_path, key, export in cases:
        if not osp.exists(osp.join(out_dir, npz_name)):
            print(f"  round-trip skipped (not converted): {npz_name}")
            continue
        variables = load_npz(osp.join(out_dir, npz_name))
        back = export(variables)
        orig = load_torch_state_dict(pth_path, key)
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
              f"== {osp.basename(pth_path)}[{key}]")
    # params_ema independence: the two generator keys must actually
    # differ (proves param_key selection; the drill fabricates distinct
    # EMA weights, and real EMA always differs from the raw params)
    p_a = osp.join(out_dir, "net_g_params.npz")
    p_b = osp.join(out_dir, "net_g_params_ema.npz")
    if osp.exists(p_a) and osp.exists(p_b):
        import jax

        la = jax.tree_util.tree_leaves(load_npz(p_a))
        lb = jax.tree_util.tree_leaves(load_npz(p_b))
        assert any(not np.array_equal(x, y) for x, y in zip(la, lb)), (
            "net_g params and params_ema are identical — param_key "
            "selection is not actually selecting")
        print("params vs params_ema: distinct (key selection proven)")


# --------------------------------------------------------------------------
# step 3: load through the demo/test.py path
# --------------------------------------------------------------------------

def load_via_demo(out_dir: str):
    """The demo/test.py load path accepts the converted files."""
    import jax

    from synergize_motion_appearance_tpu.demo import build_and_load
    from synergize_motion_appearance_tpu.utils.options import load_yaml

    cfg = load_yaml(osp.join(ROOT, "options", "train.yml"))
    cfg = dict(cfg)
    g_npz = osp.join(out_dir, "net_g_params_ema.npz")
    if not osp.exists(g_npz):
        g_npz = osp.join(out_dir, "net_g_params.npz")
    cfg["path"] = {
        "pretrain_network_g": g_npz,
        "pretrain_network_motion_estimator": osp.join(
            out_dir, "net_motion_estimator.npz"),
        "param_key_g": "params",  # npz already holds the selected key
    }
    net_g, me, g_vars, m_vars = build_and_load(cfg)
    assert "batch_stats" in m_vars, (
        "motion estimator BN running stats must ride along")
    n_leaves = len(jax.tree_util.tree_leaves(g_vars["params"]))
    print(f"demo.build_and_load loaded converted weights "
          f"({n_leaves} generator param leaves)")
    return net_g, me, g_vars, m_vars


# --------------------------------------------------------------------------
# step 4: synthetic battery (metric backbones are alive + ordered)
# --------------------------------------------------------------------------

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


# --------------------------------------------------------------------------
# step 5: real-data self-reenactment battery
# --------------------------------------------------------------------------

def _list_videos(data_dir: str):
    """Videos as mp4 files or frame-folder subdirs (VoxCeleb layout)."""
    entries = sorted(os.listdir(data_dir))
    vids = []
    for e in entries:
        p = osp.join(data_dir, e)
        if osp.isdir(p):
            vids.append(p)
        elif e.lower().endswith((".mp4", ".gif", ".mov", ".avi")):
            vids.append(p)
    return vids


def _load_video_frames(path: str, size: int, max_frames: int):
    import cv2

    from synergize_motion_appearance_tpu.utils.img_util import (
        read_video_frames)

    if osp.isdir(path):
        import glob

        frames = (sorted(glob.glob(path + "/*.png"))
                  or sorted(glob.glob(path + "/*.jpg")))[:max_frames]
        out = []
        for f in frames:
            img = cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
            if img.shape[:2] != (size, size):
                img = cv2.resize(img, (size, size))
            out.append(img)
        return np.stack(out) if out else None
    frames, _ = read_video_frames(path, max_frames=max_frames)
    if frames is None or len(frames) == 0:
        return None
    if frames.shape[1:3] != (size, size):
        frames = np.stack([cv2.resize(f, (size, size)) for f in frames])
    return frames


def data_battery(out_dir: str, data_dir: str, work_dir: str,
                 max_videos: int = 4, max_frames: int = 32,
                 reference_results: str = None):
    """Self-reenactment on real videos with the ingested weights, then
    the reference's directory battery (appmotioncomp_model.py:529-568).
    frame 0 is the source, all frames drive — result vs driving is the
    reconstruction contract the reference scores."""
    os.environ["SAMT_WEIGHTS_DIR"] = out_dir
    import cv2

    from synergize_motion_appearance_tpu.inference import (
        build_pipeline_from_config)
    from synergize_motion_appearance_tpu.metrics.psnr_ssim import (
        calculate_l1, calculate_psnr, calculate_ssim)
    from synergize_motion_appearance_tpu.utils.options import load_yaml

    cfg = dict(load_yaml(osp.join(ROOT, "options", "train.yml")))
    g_npz = osp.join(out_dir, "net_g_params_ema.npz")
    if not osp.exists(g_npz):
        g_npz = osp.join(out_dir, "net_g_params.npz")
    cfg["path"] = {
        "pretrain_network_g": g_npz,
        "pretrain_network_motion_estimator": osp.join(
            out_dir, "net_motion_estimator.npz"),
        "param_key_g": "params",
    }
    from synergize_motion_appearance_tpu.demo import build_and_load

    net_g, me, g_vars, m_vars = build_and_load(cfg)
    pipe = build_pipeline_from_config(cfg, g_vars, m_vars,
                                      net_g=net_g, motion_estimator=me)

    size = int(cfg["network_g"].get("img_size", 256))
    vids = _list_videos(data_dir)[:max_videos]
    if not vids:
        raise SystemExit(f"--data {data_dir}: no videos found "
                         f"(mp4 files or frame-folder subdirs)")
    d_res = osp.join(work_dir, "result")
    d_drv = osp.join(work_dir, "driving")
    os.makedirs(d_res, exist_ok=True)
    os.makedirs(d_drv, exist_ok=True)
    per_frame = {"l1_255": [], "psnr": [], "ssim": []}
    n = 0
    for vp in vids:
        frames = _load_video_frames(vp, size, max_frames)
        if frames is None or len(frames) < 2:
            print(f"  skipping unreadable/short video: {vp}")
            continue
        # self-reenactment: source = frame 0, driving = all frames
        result = pipe.animate(frames[0], frames, relative=False,
                              adapt_movement_scale=False)
        for i, (r, d) in enumerate(zip(result, frames)):
            cv2.imwrite(osp.join(d_res, f"{n:06d}.png"),
                        cv2.cvtColor(r, cv2.COLOR_RGB2BGR))
            cv2.imwrite(osp.join(d_drv, f"{n:06d}.png"),
                        cv2.cvtColor(d, cv2.COLOR_RGB2BGR))
            per_frame["l1_255"].append(calculate_l1(r, d))
            per_frame["psnr"].append(calculate_psnr(r, d))
            per_frame["ssim"].append(calculate_ssim(r, d))
            n += 1
        print(f"  reenacted {osp.basename(vp)}: {len(frames)} frames")

    scores = {k: float(np.mean(v)) for k, v in per_frame.items()}
    # the reference's directory-level battery; each metric gates on the
    # same artifacts/deps the reference needs for it
    from synergize_motion_appearance_tpu.metrics import external as ext

    for name, fn, args in (
            ("fid", ext.calculate_fid, ([d_drv, d_res],)),
            ("lpips", ext.calculate_lpips, (d_res, d_drv)),
            ("aed", ext.calculate_aed, (d_drv, d_res)),
            ("akd", ext.calculate_akd, (d_drv, d_res)),
            ("id_similarity", ext.calculate_id_similarity,
             (d_drv, d_res)),
            ("pose", ext.calculate_pose_accuracy, (d_drv, d_res))):
        try:
            scores[name] = float(fn(*args))
        except Exception as e:  # missing model/dep — same gating as ref
            print(f"  {name}: unavailable ({type(e).__name__}: "
                  f"{str(e)[:120]})")
    print("real-data battery:", json.dumps(
        {k: round(v, 5) for k, v in scores.items()}))

    if reference_results:
        # BASELINE acceptance: OUR results vs the REFERENCE's generated
        # results for the same inputs — frame-for-frame
        ref_imgs = sorted(os.listdir(reference_results))
        our_imgs = sorted(os.listdir(d_res))
        m = min(len(ref_imgs), len(our_imgs))
        diffs = []
        for a, b in zip(our_imgs[:m], ref_imgs[:m]):
            ia = cv2.imread(osp.join(d_res, a)).astype(np.float64)
            ib = cv2.imread(osp.join(reference_results, b)).astype(
                np.float64)
            diffs.append(np.abs(ia - ib).mean())
        parity = {"frames": m, "mean_l1_255": float(np.mean(diffs)),
                  "max_l1_255": float(np.max(diffs))}
        try:
            parity["lpips_vs_ref"] = float(
                ext.calculate_lpips(d_res, reference_results))
        except Exception:
            pass
        print("parity vs reference results:", json.dumps(
            {k: round(float(v), 5) for k, v in parity.items()}))
        scores["parity"] = parity

    with open(osp.join(work_dir, "scores.json"), "w") as f:
        json.dump(scores, f, indent=1)
    print(f"scores written to {osp.join(work_dir, 'scores.json')}")
    return scores


# --------------------------------------------------------------------------

def run(bundle_dir: str, out_dir: str = None, data_dir: str = None,
        skip_battery: bool = False, skip_nets: bool = False,
        max_videos: int = 4, max_frames: int = 32,
        reference_results: str = None):
    """The full chain; the drill and the CLI both land here."""
    out_dir = out_dir or osp.join(bundle_dir, "converted")
    missing = ingest(bundle_dir, out_dir, skip_nets=skip_nets)
    if not skip_nets:
        roundtrip_check(bundle_dir, out_dir)
        load_via_demo(out_dir)
    if not skip_battery:
        battery(out_dir, osp.join(out_dir, "battery_work"))
    if data_dir:
        data_battery(out_dir, data_dir,
                     osp.join(out_dir, "data_battery_work"),
                     max_videos=max_videos, max_frames=max_frames,
                     reference_results=reference_results)
    return out_dir, missing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help="directory with the released .pth bundle")
    ap.add_argument("--out", default=None,
                    help="output dir for converted .npz "
                         "(default: WEIGHTS/converted)")
    ap.add_argument("--data", default=None,
                    help="real video dir (mp4s or frame folders) for "
                         "the self-reenactment battery")
    ap.add_argument("--reference-results", default=None,
                    help="dir of reference-generated result frames for "
                         "the parity acceptance row")
    ap.add_argument("--max-videos", type=int, default=4)
    ap.add_argument("--max-frames", type=int, default=32)
    ap.add_argument("--skip-battery", action="store_true")
    ap.add_argument("--skip-nets", action="store_true",
                    help="metric backbones only")
    args = ap.parse_args()

    run(args.weights, args.out, args.data,
        skip_battery=args.skip_battery, skip_nets=args.skip_nets,
        max_videos=args.max_videos, max_frames=args.max_frames,
        reference_results=args.reference_results)
    print("RELEASE INGEST COMPLETE")


if __name__ == "__main__":
    main()
