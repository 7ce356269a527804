"""DCN microbench: corner-packed vs naive 4-gather bilinear im2col.

VERDICT r4 item 9: ops/dcn.py is the jnp equivalent of the reference's
1716-LoC CUDA extension (deformable_im2col_bilinear,
deform_conv_cuda_kernel.cu:85-115). DCNv2Pack is off the talking-head
hot path (arch_util.py:209-236 — an alignment utility), so the bar is a
measured verdict at its production shapes, matching the grid_sample
treatment: naive 4-gather vs the warp-style corner-packed gather
(one lane-aligned (N,4C) gather, per-pixel slot weights).

Shapes: DCNv2Pack as used by BasicSR alignment modules (EDVR-style):
num_feat=64, 3x3, deformable_groups=8, plus a dg=1 variant.

Usage: python tools/bench_dcn.py   (on TPU; ~1 min)
"""
import os
import sys
import time
from os import path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/samt_jax_cache")

import numpy as np


def bench(fn, *args, iters=20):
    import jax

    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    # chained: enqueue all iters, fetch once (axon relay round-trips)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    np.asarray(jax.device_get(outs[-1]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    import synergize_motion_appearance_tpu.ops.dcn as dcn

    rng = np.random.RandomState(0)
    cases = [
        # (B, H, W, C, dg)  — DCNv2Pack alignment shapes
        (4, 64, 64, 64, 8),
        (4, 64, 64, 64, 1),
        (2, 128, 128, 64, 8),
        (8, 32, 32, 128, 8),
    ]
    for dtype in (np.float32, "bf16"):
        for B, H, W, C, dg in cases:
            x = rng.randn(B, H, W, C).astype(np.float32)
            offset = (rng.randn(B, H, W, dg * 9 * 2) * 2).astype(
                np.float32)
            mask = rng.rand(B, H, W, dg * 9).astype(np.float32)
            wgt = (rng.randn(3, 3, C, C) * 0.05).astype(np.float32)
            if dtype == "bf16":
                x = jnp.asarray(x, jnp.bfloat16)
                offset = jnp.asarray(offset, jnp.bfloat16)
                mask = jnp.asarray(mask, jnp.bfloat16)
                wgt = jnp.asarray(wgt, jnp.bfloat16)
            else:
                x, offset, mask, wgt = map(jnp.asarray,
                                           (x, offset, mask, wgt))

            def run(gather_impl, x=x, offset=offset, mask=mask, wgt=wgt):
                saved = dcn._bilinear_gather
                # swap the gather under test (module-level monkeypatch
                # is trace-time only; each variant jits its own graph)
                def f(x_, o_, m_, w_):
                    dcn._bilinear_gather = gather_impl
                    try:
                        return dcn.modulated_deform_conv2d(
                            x_, o_, m_, w_, padding=(1, 1),
                            deformable_groups=dg)
                    finally:
                        dcn._bilinear_gather = saved
                return bench(f, x, offset, mask, wgt)

            t_packed = run(dcn._bilinear_gather)
            t_naive = run(dcn._bilinear_gather_naive)
            name = f"({B},{H},{W},{C}) dg={dg} {'bf16' if dtype=='bf16' else 'f32'}"
            print(f"{name:38s} packed {t_packed*1e6:7.0f} us   "
                  f"naive {t_naive*1e6:7.0f} us   "
                  f"speedup {t_naive/t_packed:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
