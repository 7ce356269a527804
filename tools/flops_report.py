"""Analytic FLOPs + MFU for the flagship reenactment pipeline.

FLOPs come from XLA's own HLO cost analysis (`Lowered.cost_analysis()`)
of the EXACT jitted stage functions bench.py runs — not a hand model —
so the count tracks the real compiled graph. Everything is lowered from
abstract ShapeDtypeStructs: no weights are materialized and nothing
executes, so the measurement is cheap enough to re-run on any box:

    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/flops_report.py [--train]

which prints per-stage flops; paste the reported value into
FLAGSHIP_FLOPS_PER_FRAME below. bench.py imports `flagship_inference_mfu`
to emit `mfu` next to fps.

MFU definition: achieved_flops / peak_flops, achieved = fps *
flops_per_frame, peak = the chip's dense bf16 matmul peak (the pipeline
computes in bf16 on the MXU). The reference has no counterpart
(SURVEY.md 5.1: thop in requirements but never imported).
"""
from __future__ import annotations

import json
import os
import sys
from os import path as osp

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

# ---------------------------------------------------------------------------
# measured constants (refresh by running this file)
# ---------------------------------------------------------------------------

# HLO flops per generated frame at frame_batch=16, 256², bf16 pipeline
# (kp stage on pre-downsampled 64² frames + gen stage, enc amortized out).
# Measured 2026-08-17: kp 41.9e9 + gen 4886.1e9 per 16-frame chunk
# (enc 59.0e9 once per source).
FLAGSHIP_FLOPS_PER_FRAME: float | None = 3.08004e11

# HLO flops per sample of one full train step (G+D phases) at 256².
# Measured 2026-08-17 (--train): 5.8262e12 at batch 2.
TRAIN_STEP_FLOPS_PER_SAMPLE: float = 2.913119e12

# dense bf16 matmul peak per chip
PEAK_FLOPS_BY_KIND = {
    "tpu v5 lite": 197e12,   # v5e: 197 TFLOP/s bf16
    "tpu v5p": 459e12,
    "tpu v5": 459e12,
    "tpu v4": 275e12,
    "tpu v6 lite": 918e12,   # v6e / trillium
}


def _device_peak_flops() -> float | None:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_FLOPS_BY_KIND.items():
        if k in kind:
            return v
    env = os.environ.get("SAMT_PEAK_FLOPS")
    return float(env) if env else None


def flagship_inference_mfu(fps: float) -> dict:
    """Extra bench fields: analytic flops/frame and model-flops
    utilization at the given throughput."""
    if FLAGSHIP_FLOPS_PER_FRAME is None:
        return {}
    peak = _device_peak_flops()
    out = {"flops_per_frame": FLAGSHIP_FLOPS_PER_FRAME}
    if peak:
        out["mfu"] = round(fps * FLAGSHIP_FLOPS_PER_FRAME / peak, 4)
    return out


# ---------------------------------------------------------------------------
# measurement (abstract lowering — runs anywhere, executes nothing)
# ---------------------------------------------------------------------------

def _abstract(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)


def _flops_of(lowered) -> float:
    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def measure_inference_flops(img: int = 256, frame_batch: int = 16) -> dict:
    """Cost-analyze the bench pipeline's jitted stages (kp / enc / gen)."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from synergize_motion_appearance_tpu.inference import ReenactmentPipeline
    from synergize_motion_appearance_tpu.models import build_network
    from __graft_entry__ import _flagship_config

    cfg = _flagship_config(img)
    net_g = build_network(cfg["network_g"])
    me = build_network(cfg["network_motion_estimator"])

    s = jax.ShapeDtypeStruct((1, img, img, 3), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    m_vars = jax.eval_shape(me.init, key, s, s)
    dm = jax.eval_shape(lambda v, a, b: me.apply(v, a, b), m_vars, s, s)
    g_vars = jax.eval_shape(
        lambda k, s_, dmv: net_g.init(k, s_, dmv, inference=True),
        key, s, dm)

    pipe = ReenactmentPipeline(
        net_g, me, g_vars, m_vars, relative=True, adapt_scale=True,
        frame_batch=frame_batch, u8_io=True, host_kp_downsample=True,
        yuv420_io=True)
    # pipeline casts vars to bf16; they are already abstract structs

    kp_scale = me.kp_detector_params.get("scale_factor", 1.0)
    kp_hw = int(img * kp_scale)
    kp_in = jax.ShapeDtypeStruct((frame_batch, kp_hw, kp_hw, 3),
                                 ml_dtypes.bfloat16)
    kp_one_in = jax.ShapeDtypeStruct((1, kp_hw, kp_hw, 3),
                                     ml_dtypes.bfloat16)

    kp_flops = _flops_of(pipe._kp_jit.lower(pipe.m_vars, kp_in, True))
    enc_flops = _flops_of(pipe._enc_jit.lower(pipe.g_vars, s))

    src_feats = jax.eval_shape(pipe._enc_impl, pipe.g_vars, s)
    kp_impl_pre = lambda v, x: pipe._kp_impl(v, x, True)  # static flag
    kp_one = jax.eval_shape(kp_impl_pre, pipe.m_vars, kp_one_in)
    kp_many = jax.eval_shape(kp_impl_pre, pipe.m_vars, kp_in)
    gen_flops = _flops_of(pipe._gen_jit.lower(
        pipe.g_vars, pipe.m_vars, s, src_feats, kp_one, kp_many, kp_one))

    return {
        "img": img,
        "frame_batch": frame_batch,
        "kp_stage_flops": kp_flops,
        "gen_stage_flops": gen_flops,
        "enc_stage_flops_per_source": enc_flops,
        "flops_per_frame": (kp_flops + gen_flops) / frame_batch,
    }


def measure_train_flops(img: int = 256, batch: int = 2) -> dict:
    """HLO flops of one full jitted train step (G+D phases) at flagship
    shape — feeds the train-MFU line in BASELINE.md."""
    import jax
    import jax.numpy as jnp

    from synergize_motion_appearance_tpu.training import Trainer
    from synergize_motion_appearance_tpu.utils.options import parse

    opt = parse(osp.join(ROOT, "options", "train.yml"), is_train=True)
    trainer = Trainer(opt)
    b = {"source": jax.ShapeDtypeStruct((batch, img, img, 3), jnp.float32),
         "driving": jax.ShapeDtypeStruct((batch, img, img, 3),
                                         jnp.float32)}
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    state, vgg_params = jax.eval_shape(trainer.init_state, key, b)
    step = jax.jit(trainer.make_train_step())
    lowered = step.lower(state, b, key, vgg_params)
    return {"img": img, "batch": batch,
            "train_step_flops": _flops_of(lowered),
            "train_step_flops_per_sample": _flops_of(lowered) / batch}


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    r = measure_inference_flops()
    print(json.dumps(r, indent=2))
    print(f"FLAGSHIP_FLOPS_PER_FRAME = {r['flops_per_frame']:.6g}")
    if "--train" in sys.argv:
        t = measure_train_flops()
        print(json.dumps(t, indent=2))
