"""Microbench: decoder 3x3 conv strategies at TRAIN batch (B=2) on TPU.

PERF.md §8 target 1: at B=2 the XLA conv emitter picks blocked layouts
whose elementwise neighbors pay relayouts (~15-25 ms/step). Candidates
benched here against the native conv, fwd AND bwd (the train step runs
both):

- xla_conv   : lax.conv_general_dilated NHWC (what nn.Conv emits)
- flat_taps  : stride-1 im2col on a (B,H,W*C) lane-aligned view + one
               dot_general (layers._flat_taps, the C<=8 production path)
- batch_in_h : both images merged into H with seam rows (fills sublanes)

Timing protocol per tpu-perf notes: chain ITERS applications inside one
jit (fori_loop, CSE-defeated), fetch a fresh slice to force completion.

Usage: python tools/bench_conv_b2.py   (repo root; real TPU)
"""
import os
import sys
import time
from os import path as osp

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/samt_jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from synergize_motion_appearance_tpu.models.layers import _flat_taps

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    SHAPES = [
        (2, 256, 256, 64, 64),
        (2, 128, 128, 128, 128),
        (2, 64, 64, 128, 128),
    ]
    ITERS = int(os.environ.get("CONVBENCH_ITERS", "30"))
    dtype = jnp.bfloat16

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def flat_taps_conv(x, w):
        kh, kw, cin, cout = w.shape
        taps = _flat_taps(x, kh, kw, ((1, 1), (1, 1)))
        return jax.lax.dot_general(
            taps, w.astype(x.dtype).reshape(kh * kw, cin, cout),
            (((2, 4), (0, 1)), ((), ())))

    def batch_in_height(x, w):
        B, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        tall = xp.reshape(B * (H + 2), W + 2, C)[None]
        y = jax.lax.conv_general_dilated(
            tall, w.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.pad(y, ((0, 0), (0, 2), (0, 0), (0, 0)))
        return y.reshape(B, H + 2, W, -1)[:, :H]

    variants = {
        "xla_conv": xla_conv,
        "flat_taps": flat_taps_conv,
        "batch_in_h": batch_in_height,
    }

    for (B, H, W, Cin, Cout) in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32), dtype)
        wk = jnp.asarray(
            rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.05, dtype)
        print(f"\n== ({B},{H},{W},{Cin})->{Cout} bf16, {ITERS} iters")
        ref_f = ref_g = None
        for name, fn in variants.items():
            # --- forward ---
            def many(x0, w0):
                def body(i, v):
                    return fn(v, w0) * jnp.asarray(0.999, v.dtype) \
                        + x0 * jnp.asarray(0.01, v.dtype)
                return jax.lax.fori_loop(0, ITERS, body, x0)

            f = jax.jit(many)
            _ = np.asarray(f(x, wk)[0, :2, :2, :2])
            t0 = time.perf_counter()
            _ = np.asarray(f(x, wk)[0, :2, :2, :2])
            dt = (time.perf_counter() - t0) / ITERS
            fl = 2 * B * H * W * 9 * Cin * Cout

            # --- fwd+bwd (what the train step pays): grad wrt x AND w of
            # sum(fn(x,w)*cot) chained ---
            def many_g(x0, w0, cot):
                def body(i, carry):
                    v, wv = carry
                    gx, gw = jax.grad(
                        lambda a, b: (fn(a, b) * cot).sum(), (0, 1))(v, wv)
                    return (v * jnp.asarray(0.999, v.dtype)
                            + gx.astype(v.dtype) * jnp.asarray(0.01, v.dtype),
                            wv + gw.astype(wv.dtype) * jnp.asarray(1e-6, wv.dtype))
                return jax.lax.fori_loop(0, ITERS, body, (x0, w0))

            cot = jnp.asarray(rng.randn(B, H, W, Cout).astype(np.float32),
                              dtype)
            g = jax.jit(many_g)
            _ = np.asarray(g(x, wk, cot)[0][0, :2, :2, :2])
            t0 = time.perf_counter()
            _ = np.asarray(g(x, wk, cot)[0][0, :2, :2, :2])
            dtg = (time.perf_counter() - t0) / ITERS
            print(f"  {name:10s} fwd {dt*1e6:8.1f} us ({fl/dt/1e12:5.1f} TF/s)"
                  f"   fwd+bwd {dtg*1e6:9.1f} us ({3*fl/dtg/1e12:5.1f} TF/s)")

            yf = np.asarray(jax.jit(fn)(x, wk), np.float32)
            if ref_f is None:
                ref_f = yf
            else:
                err = np.abs(yf - ref_f).max() / (np.abs(ref_f).max() + 1e-9)
                print(f"             max rel err vs xla_conv: {err:.2e}")


if __name__ == "__main__":
    main()
