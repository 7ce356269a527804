"""Export AOT serving artifacts for the reenactment pipeline.

Builds the networks from a config YAML (loading checkpoints when the
config's `path:` section names them), wraps them in the inference
pipeline with the requested flags, and serializes the jitted stages +
weights to a deployable artifact directory (see
synergize_motion_appearance_tpu/serving.py).

Run ON the target platform to capture its fastest kernels (the Pallas
attention path requires a TPU-backend trace); `--platforms cpu,tpu`
emits one portable multi-platform artifact instead.

Usage:
  python tools/export_serving.py --config options/test.yml --out art/ \
      --relative --adapt_scale --fast --frame_batch 16
"""
import argparse
import os
import sys
from os import path as osp

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--frame_batch", type=int, default=16)
    p.add_argument("--relative", action="store_true")
    p.add_argument("--adapt_scale", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fast", action="store_true",
                   help="production IO: bf16 + uint8 host link + I420 "
                        "D2H + host kp downsampling")
    p.add_argument("--platforms", default=None,
                   help="comma list (e.g. cpu,tpu); default: current "
                        "backend only")
    p.add_argument("--cpu", action="store_true")
    opt = p.parse_args(argv)

    import jax

    if opt.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from synergize_motion_appearance_tpu.demo import build_and_load
    from synergize_motion_appearance_tpu.inference import ReenactmentPipeline
    from synergize_motion_appearance_tpu.serving import export_pipeline
    from synergize_motion_appearance_tpu.utils.options import load_yaml

    config = load_yaml(opt.config)
    net_g, motion_estimator, g_vars, m_vars = build_and_load(config)
    pipeline = ReenactmentPipeline(
        net_g, motion_estimator, g_vars, m_vars,
        relative=opt.relative, adapt_scale=opt.adapt_scale,
        frame_batch=opt.frame_batch,
        compute_dtype=jnp.bfloat16 if (opt.bf16 or opt.fast) else None,
        u8_io=opt.fast, yuv420_io=opt.fast, host_kp_downsample=opt.fast,
    )
    platforms = (opt.platforms.split(",") if opt.platforms else None)
    export_pipeline(pipeline, opt.out, platforms=platforms)
    total = sum(
        os.path.getsize(osp.join(opt.out, f))
        for f in os.listdir(opt.out)
    )
    print(f"Exported serving artifact to {opt.out} "
          f"({total / 1e6:.1f} MB, platforms="
          f"{platforms or [jax.default_backend()]})")


if __name__ == "__main__":
    main()
