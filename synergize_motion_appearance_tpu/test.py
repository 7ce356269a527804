"""Frame-pair evaluation entry point (parity target: basicsr/test.py:51-85
+ AppMotionCompModel.nondist_validation, appmotioncomp_model.py:463-570).

Runs the pairs-list dataset through the pipeline, writes the
visual/result/source/driving PNG quads, and accumulates metrics.
"""
from __future__ import annotations

import argparse
from os import path as osp

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    args = parser.parse_args(argv)

    import jax

    from .data import build_dataset
    from .demo import build_and_load
    from .inference import ReenactmentPipeline
    from .metrics import calculate_metric
    from .utils.img_util import arr2img, imwrite
    from .utils.logger import get_root_logger
    from .utils.options import make_exp_dirs, parse

    opt = parse(args.opt, is_train=False)
    make_exp_dirs(opt)
    logger = get_root_logger()

    net_g, motion_estimator, g_vars, m_vars = build_and_load(opt)

    vis_root = opt["path"]["visualization"]
    val_opt = opt.get("val", {})
    metrics_opt = val_opt.get("metrics") or {}

    for ds_name, ds_opt in (opt.get("datasets") or {}).items():
        ds_opt["is_train"] = False
        dataset = build_dataset(ds_opt)
        name = ds_opt.get("name", ds_name)
        logger.info(f"Testing {name}: {len(dataset)} pairs")
        results = {m: 0.0 for m in metrics_opt}
        count = 0

        import jax.numpy as jnp

        def fwd(g_vars, m_vars, source, driving):
            dense_motion = motion_estimator.apply(
                m_vars, driving, source, train=False
            )
            out = net_g.apply(g_vars, source, dense_motion,
                              w=val_opt.get("w", 1), inference=True)
            return out["out"]

        fwd_jit = jax.jit(fwd)

        for idx in range(len(dataset)):
            item = dataset[idx]
            source = jnp.asarray(item["source"])[None]
            driving = jnp.asarray(item["driving"])[None]
            result = np.asarray(fwd_jit(g_vars, m_vars, source, driving))

            result_img = arr2img(result, rgb2bgr=True)
            gt_img = arr2img(item["driving"], rgb2bgr=True)
            src_img = arr2img(item["source"], rgb2bgr=True)
            visual = np.concatenate((src_img, gt_img, result_img), axis=1)

            img_name = item["frame_name"]
            if val_opt.get("save_img", True):
                imwrite(visual, osp.join(vis_root, name, "visual",
                                         f"{img_name}_v.png"))
                imwrite(result_img, osp.join(vis_root, name, "result",
                                             f"{img_name}_r.png"))
                imwrite(src_img, osp.join(vis_root, name, "source",
                                          f"{img_name}_s.png"))
                imwrite(gt_img, osp.join(vis_root, name, "driving",
                                         f"{img_name}_d.png"))

            for mname, mopt in metrics_opt.items():
                if mname in ("psnr", "ssim", "l1"):
                    results[mname] += calculate_metric(
                        dict(img1=result_img, img2=gt_img), mopt
                    )
            count += 1

        for mname, mopt in metrics_opt.items():
            if mname in ("psnr", "ssim", "l1"):
                results[mname] /= max(count, 1)
            elif mname == "fid":
                results[mname] = calculate_metric(dict(paths=[
                    osp.join(vis_root, name, "source"),
                    osp.join(vis_root, name, "result"),
                ]), mopt)
            elif mname == "lpips":
                results[mname] = calculate_metric(dict(
                    path1=osp.join(vis_root, name, "result"),
                    path2=osp.join(vis_root, name, "driving"),
                ), mopt)
            else:
                gt_dir = ("source" if val_opt.get("cross_id") and
                          mname in ("face_aed", "id_similarity")
                          else "driving")
                results[mname] = calculate_metric(dict(
                    path_gt=osp.join(vis_root, name, gt_dir),
                    path_generated=osp.join(vis_root, name, "result"),
                ), mopt)
        if "l1" in results:
            results["l1_255"] = results["l1"] / 255.0
        for mname, v in results.items():
            logger.info(f"  # {mname}: {v:.4f}")


if __name__ == "__main__":
    main()
