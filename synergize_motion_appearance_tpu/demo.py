"""Standalone inference CLI (parity target: basicsr/demo.py:136-249).

Same flags and behavior: --config YAML for network specs + checkpoint
paths, --source_image / --driving_video / --result_video, --relative,
--adapt_scale, --find_best_frame / --best_frame, --audio.

TPU-native difference: frames are generated in device batches via
ReenactmentPipeline (see inference.py docstring) instead of a per-frame
python loop.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_and_load(config):
    """Build net_g + motion estimator and load checkpoints if configured."""
    import jax

    from .models import build_network
    from .training.checkpoint import load_variables

    net_g = build_network(config["network_g"])
    motion_estimator = build_network(config["network_motion_estimator"])

    path_cfg = config.get("path", {}) or {}
    g_path = path_cfg.get("pretrain_network_g")
    m_path = path_cfg.get("pretrain_network_motion_estimator")

    import jax.numpy as jnp

    img_size = int(config["network_g"].get("img_size", 256))
    dummy_s = jnp.zeros((1, img_size, img_size, 3))
    dummy_d = jnp.zeros((1, img_size, img_size, 3))
    rng = jax.random.PRNGKey(0)
    # jit init/apply — eager dispatch is pathological on remote TPU links
    m_vars = jax.jit(motion_estimator.init)(rng, dummy_d, dummy_s)
    dense_motion = jax.jit(motion_estimator.apply)(m_vars, dummy_d, dummy_s)
    g_vars = jax.jit(
        lambda k, s, dm: net_g.init(k, s, dm, inference=True)
    )(rng, dummy_s, dense_motion)

    if g_path:
        loaded = load_variables(
            g_path, path_cfg.get("param_key_g", "params_ema"))
        g_vars = {**dict(g_vars), **loaded}
    if m_path:
        # batch_stats ride along: the motion estimator's BN running
        # stats are part of its trained weights (base_model.py load
        # semantics keep them inside the state_dict)
        loaded = load_variables(
            m_path, path_cfg.get("param_key_m", "params"))
        m_vars = {**dict(m_vars), **loaded}
    return net_g, motion_estimator, g_vars, m_vars


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--from_export", default=None,
                        help="serve from an AOT artifact directory "
                             "(tools/export_serving.py) instead of "
                             "building networks from --config; pipeline "
                             "flags come from the artifact manifest")
    parser.add_argument("--source_image", default="source.png")
    parser.add_argument("--driving_video", default="driving.mp4")
    parser.add_argument("--result_video", default="result.mp4")
    parser.add_argument("--visual_video", default=None)
    parser.add_argument("--relative", action="store_true")
    parser.add_argument("--adapt_scale", action="store_true")
    parser.add_argument("--find_best_frame", action="store_true")
    parser.add_argument("--best_frame", type=int, default=None)
    parser.add_argument("--frame_batch", type=int, default=8)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 inference (fastest on TPU; "
                             "default float32 for exact parity)")
    parser.add_argument("--fast", action="store_true",
                        help="production IO path: bf16 compute, uint8 "
                             "frames over the host link, codec-native "
                             "I420 D2H, host-side kp downsampling")
    parser.add_argument("--audio", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    opt = parser.parse_args(argv)

    if opt.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import cv2

    from .inference import ReenactmentPipeline, find_best_frame
    from .utils.img_util import arr2img, img2arr, mimsave, read_video_frames
    from .utils.options import load_yaml

    if opt.from_export is not None:
        from .serving import load_serving_pipeline

        pipeline = load_serving_pipeline(opt.from_export)
        img_size = pipeline.img_size
        fast_io = pipeline.u8_io
    else:
        if opt.config is None:
            parser.error("--config is required unless --from_export is set")
        config = load_yaml(opt.config)
        img_size = int(config["network_g"].get("img_size", 256))
        fast_io = opt.fast

    # host-side decode + preprocessing (demo.py:165-185)
    source_bgr = cv2.imread(opt.source_image, cv2.IMREAD_COLOR)
    source_bgr = cv2.resize(source_bgr, (img_size, img_size),
                            interpolation=cv2.INTER_LINEAR)
    source = img2arr(source_bgr.astype(np.float32) / 255.0,
                     bgr2rgb=True)[None]

    frames_rgb, fps = read_video_frames(opt.driving_video,
                                        size=(img_size, img_size))
    driving = np.stack([
        img2arr(f.astype(np.float32) / 255.0, bgr2rgb=False)
        for f in frames_rgb
    ]).astype(np.float32)

    if opt.from_export is None:
        net_g, motion_estimator, g_vars, m_vars = build_and_load(config)
        import jax.numpy as jnp

        pipeline = ReenactmentPipeline(
            net_g, motion_estimator, g_vars, m_vars,
            relative=opt.relative, adapt_scale=opt.adapt_scale,
            frame_batch=opt.frame_batch,
            compute_dtype=jnp.bfloat16 if (opt.bf16 or opt.fast) else None,
            u8_io=opt.fast, yuv420_io=opt.fast, host_kp_downsample=opt.fast,
        )
    if fast_io:
        # feed uint8 straight through; normalization runs on device
        source = np.clip((source + 1.0) * 127.5, 0,
                         255).astype(np.uint8)
        driving = np.clip((driving + 1.0) * 127.5, 0,
                          255).astype(np.uint8)

    if opt.find_best_frame or opt.best_frame is not None:
        anchor = (opt.best_frame if opt.best_frame is not None
                  else find_best_frame(source, driving, pipeline=pipeline,
                                       cpu=opt.cpu))
        print(f"Best frame: {anchor}")
        preds = pipeline.animate_with_anchor(source, driving, anchor)
    else:
        preds = pipeline.animate(source, driving)

    if preds.dtype == np.uint8:  # --fast path returns RGB uint8 directly
        pred_imgs = list(preds)
    else:
        pred_imgs = [arr2img(p, rgb2bgr=False) for p in preds]  # RGB uint8
    mimsave(pred_imgs, opt.result_video, fps=fps)
    print(f"Saved {len(pred_imgs)} frames to {opt.result_video}")

    if opt.visual_video is not None:
        src_img = (source[0] if source.dtype == np.uint8
                   else arr2img(source, rgb2bgr=False))
        visual = [
            np.concatenate((src_img, frames_rgb[i], pred_imgs[i]), axis=1)
            for i in range(len(pred_imgs))
        ]
        mimsave(visual, opt.visual_video, fps=fps)

    if opt.audio:
        _mux_audio(opt.result_video, opt.driving_video)


def _mux_audio(result_video: str, driving_video: str):
    """Copy the driving video's audio track (demo.py:232-249), via the
    ffmpeg binary if present."""
    import shutil
    import subprocess
    import tempfile

    if shutil.which("ffmpeg") is None:
        print("ffmpeg not found; skipping audio mux.")
        return
    with tempfile.NamedTemporaryFile(
        suffix=os.path.splitext(result_video)[1], delete=False
    ) as tmp:
        tmp_path = tmp.name
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-i", result_video, "-i", driving_video,
             "-map", "0:v", "-map", "1:a?", "-c", "copy", tmp_path],
            check=True, capture_output=True,
        )
        shutil.move(tmp_path, result_video)
    except subprocess.CalledProcessError:
        print("Failed to copy audio (driving video may have no audio).")
        if os.path.exists(tmp_path):
            os.remove(tmp_path)


if __name__ == "__main__":
    main()
