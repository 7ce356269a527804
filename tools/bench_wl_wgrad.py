"""WL conv wgrad alternatives — the b8 step's dominant backward bucket.

PERF.md §11b: the b8-selective train step is dominated by the
backward's 9-tap wgrad contractions. The current form
(ops/pallas_conv_wl.py::_wl_ad_bwd) materializes a lane-shifted copy of
the padded input for each of the 9 taps (the dj∈{0,1,2} slices sit at
lane offsets ±1 → full relayout copies in WL layout). Candidates:

  A. current: 9 × einsum("bhcw,bhow->co") on dynamic slices
  B. single stacked einsum (one matmul, 9× materialized taps)
  C. transpose to NHWC + XLA's native conv-wgrad formulation
     (lax.conv_general_dilated with activations as lhs, cotangent as
     rhs over the batch-contraction dims) + transpose back
  D. lane-aligned dj via H-major shift: pad W once, keep the three dj
     slices but let XLA fuse (baseline A is exactly this — kept for
     shape-variant comparison)

Usage: python tools/bench_wl_wgrad.py   (TPU; ~2 min)
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
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0]))
    return (time.perf_counter() - t0) / iters


def wgrad_9tap(x, dy):
    import jax
    import jax.numpy as jnp

    B, H, C, W = x.shape
    acc_t = jnp.promote_types(jnp.float32, x.dtype)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)))
    taps = []
    for di in range(3):
        row = []
        for dj in range(3):
            xs = jax.lax.dynamic_slice(xpad, (0, di, 0, dj), (B, H, C, W))
            row.append(jnp.einsum("bhcw,bhow->co", xs, dy,
                                  preferred_element_type=acc_t))
        taps.append(jnp.stack(row))
    return jnp.stack(taps)


def wgrad_stacked(x, dy):
    import jax
    import jax.numpy as jnp

    B, H, C, W = x.shape
    acc_t = jnp.promote_types(jnp.float32, x.dtype)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1)))
    taps = jnp.stack([
        jax.lax.dynamic_slice(xpad, (0, di, 0, dj), (B, H, C, W))
        for di in range(3) for dj in range(3)], axis=0)
    return jnp.einsum("kbhcw,bhow->kco", taps, dy,
                      preferred_element_type=acc_t).reshape(3, 3, C, -1)


def wgrad_nhwc_conv(x, dy):
    """Transpose WL->NHWC and use XLA's native wgrad conv expression:
    treat activations as lhs with batch as a contraction (feature) dim.
    dw[kh,kw,ci,co] = sum_b x[b, h+kh-1, w+kw-1, ci] dy[b,h,w,co]."""
    import jax
    import jax.numpy as jnp

    xn = jnp.swapaxes(x, 2, 3)   # (B,H,W,C)
    dyn = jnp.swapaxes(dy, 2, 3)  # (B,H,W,Co)
    acc_t = jnp.promote_types(jnp.float32, x.dtype)
    # standard wgrad-as-conv: lhs = x transposed to (Ci, H, W, B),
    # rhs = dy as kernel (H, W, B, Co), "batch" = Ci, contraction over
    # spatial+B. XLA recognizes this as the conv weight-grad pattern.
    lhs = jnp.transpose(xn, (3, 1, 2, 0))   # Ci,H,W,B
    rhs = jnp.transpose(dyn, (1, 2, 0, 3))  # H,W,B,Co
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_t)  # (Ci, kh, kw, Co)
    return jnp.transpose(out, (1, 2, 0, 3))  # kh,kw,Ci,Co


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    rng = np.random.RandomState(0)
    # b8 decoder hot shapes in WL layout (B, H, C, W)
    shapes = [
        (8, 256, 64, 256, 64),
        (8, 128, 128, 128, 128),
        (16, 256, 64, 256, 64),   # 2-frame-pair variant
    ]
    for B, H, C, W, Co in shapes:
        x = jnp.asarray(rng.randn(B, H, C, W).astype(np.float32),
                        jnp.bfloat16)
        dy = jnp.asarray(rng.randn(B, H, Co, W).astype(np.float32),
                         jnp.bfloat16)
        flops = 9 * B * H * W * C * Co * 2
        # parity first
        a = np.asarray(wgrad_9tap(x, dy), np.float32).reshape(3, 3, C, Co)
        bzs = np.asarray(wgrad_stacked(x, dy), np.float32)
        c = np.asarray(wgrad_nhwc_conv(x, dy), np.float32)
        da = np.abs(a - bzs).max() / (np.abs(a).max() + 1e-9)
        dc = np.abs(a - c).max() / (np.abs(a).max() + 1e-9)
        print(f"shape B{B} {H}x{W} C{C}->{Co}: stacked dev {da:.2e}, "
              f"nhwc-conv dev {dc:.2e}")
        for name, fn in (("9tap", wgrad_9tap),
                         ("stacked", wgrad_stacked),
                         ("nhwc_conv", wgrad_nhwc_conv)):
            t = bench(fn, x, dy)
            print(f"  {name:10s} {t*1e6:8.0f} us  "
                  f"({flops/t/1e12:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
