"""Video reconstruction / cross-id animation entry point.

Parity target: basicsr/animate.py:49-83 + generate_video_image
(appmotioncomp_model.py:642-756): per CSV pair, split the driving video at
the anchor, animate forward+backward, stitch, write frames + mp4 + the
same metric battery.
"""
from __future__ import annotations

import argparse
from os import path as osp

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument("--frame_batch", type=int, default=8)
    args = parser.parse_args(argv)

    from .data import build_dataset
    from .demo import build_and_load
    from .inference import ReenactmentPipeline
    from .metrics import calculate_metric
    from .utils.img_util import arr2img, imwrite, mimsave
    from .utils.logger import get_root_logger
    from .utils.options import make_exp_dirs, parse

    opt = parse(args.opt, is_train=False)
    make_exp_dirs(opt)
    logger = get_root_logger()
    val_opt = opt.get("val", {})
    metrics_opt = val_opt.get("metrics") or {}
    vis_root = opt["path"]["visualization"]

    net_g, motion_estimator, g_vars, m_vars = build_and_load(opt)
    pipeline = ReenactmentPipeline(
        net_g, motion_estimator, g_vars, m_vars,
        relative=val_opt.get("relative", False),
        adapt_scale=val_opt.get("adapt_scale", False),
        frame_batch=args.frame_batch, w=val_opt.get("w", 1),
    )

    for ds_name, ds_opt in (opt.get("datasets") or {}).items():
        ds_opt["is_train"] = False
        dataset = build_dataset(ds_opt)
        name = ds_opt.get("name", ds_name)
        results = {m: 0.0 for m in metrics_opt}
        count = 0
        for idx in range(len(dataset)):
            item = dataset[idx]
            source = item["source"][None]
            driving = item["driving_video"]
            preds = pipeline.animate_with_anchor(
                source, driving, int(item["anchor_idx"])
            )
            src_img = arr2img(source, rgb2bgr=True)
            video_name = item["video_name"]
            pred_rgb = []
            visual_rgb = []
            for i in range(preds.shape[0]):
                pred_img = arr2img(preds[i], rgb2bgr=True)
                drv_img = arr2img(driving[i], rgb2bgr=True)
                vis = np.concatenate((src_img, drv_img, pred_img), axis=1)
                img_name = f"{video_name}_{item['driving_name_list'][i]}"
                imwrite(vis, osp.join(vis_root, name, "visual",
                                      f"{img_name}_v.png"))
                imwrite(pred_img, osp.join(vis_root, name, "result",
                                           f"{img_name}_r.png"))
                imwrite(src_img, osp.join(vis_root, name, "source",
                                          f"{img_name}_s.png"))
                imwrite(drv_img, osp.join(vis_root, name, "driving",
                                          f"{img_name}_d.png"))
                pred_rgb.append(pred_img[..., ::-1])
                visual_rgb.append(vis[..., ::-1])
                for mname, mopt in metrics_opt.items():
                    if mname in ("psnr", "ssim", "l1"):
                        results[mname] += calculate_metric(
                            dict(img1=pred_img, img2=drv_img), mopt
                        )
                count += 1
            mimsave(pred_rgb, osp.join(vis_root, name, "result_videos",
                                       f"{video_name}_r.mp4"))
            mimsave(visual_rgb, osp.join(vis_root, name, "visual_videos",
                                         f"{video_name}_v.mp4"))
            logger.info(f"Animated {video_name}: {preds.shape[0]} frames")

        # directory-level metric battery at dataset end
        # (appmotioncomp_model.py:716-755 runs the same set after
        # generate_video_image)
        for mname, mopt in metrics_opt.items():
            if mname in ("psnr", "ssim", "l1"):
                if count:
                    results[mname] /= count
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
            logger.info(f"  # {mname}: {v}")


if __name__ == "__main__":
    main()
