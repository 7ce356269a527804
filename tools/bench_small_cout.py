"""Microbench: small-OUTPUT-channel 3x3 convs (RGB / flow / occlusion
heads) at the inference hot shapes.

Trace finding (docs/PERF.md §9): at fb=64 inference, the shift+matmul
path materializes kh*kw*Cin patch tensors for convs with cout<=8 but
cin>8 (RefineFlow flow/occ heads cin=128->2/1, generator RGB head
64->3) — ~66 ms of the ~503 ms device step. Candidates:

- xla_conv   : lax.conv_general_dilated (output lane-pads 3->128)
- shift_cols : current production path (9*Cin patch concat + 1 matmul)
- tap_accum  : 9 shifted-view dots accumulated — reads x 9x, never
               writes a patch tensor
- pad_cout   : zero-pad kernel to cout=128 (the emitter's good class),
               slice the real channels after

Measured fwd at inference batch AND fwd+bwd at train batch 2 (the
shift+matmul swap was motivated by train grads — a replacement must not
regress those).

Usage: python tools/bench_small_cout.py  (repo root; real TPU)
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

    from synergize_motion_appearance_tpu.models.layers import (
        _shift_conv_impl,
    )

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    SHAPES = [
        # (B, H, W, Cin, Cout): inference fb=64 hot heads + train B=2
        (64, 256, 256, 64, 3),    # generator RGB head
        (64, 256, 256, 128, 2),   # RefineFlow flow head (finest scale)
        (2, 256, 256, 64, 3),     # train-batch RGB head
    ]
    ITERS = int(os.environ.get("CONVBENCH_ITERS", "20"))
    dtype = jnp.bfloat16

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def shift_cols(x, w):
        return _shift_conv_impl(x, w.astype(x.dtype), (1, 1),
                                ((1, 1), (1, 1)))

    def tap_accum(x, w):
        kh, kw, cin, cout = w.shape
        B, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        wk = w.astype(x.dtype)
        y = jnp.zeros((B, H, W, cout), jnp.float32)
        for i in range(kh):
            for j in range(kw):
                y = y + jax.lax.dot_general(
                    xp[:, i:i + H, j:j + W, :], wk[i, j],
                    (((3,), (0,)), ((), ()))).astype(jnp.float32)
        return y.astype(x.dtype)

    def pad_cout(x, w):
        kh, kw, cin, cout = w.shape
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 128 - cout)))
        y = jax.lax.conv_general_dilated(
            x, wp.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[..., :cout]

    variants = {
        "xla_conv": xla_conv,
        "shift_cols": shift_cols,
        "tap_accum": tap_accum,
        "pad_cout": pad_cout,
    }

    for (B, H, W, Cin, Cout) in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32), dtype)
        wk = jnp.asarray(
            rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.05,
            jnp.float32)
        print(f"\n== ({B},{H},{W},{Cin})->{Cout} bf16, {ITERS} iters")
        ref_f = None
        for name, fn in variants.items():
            # chained fwd: y feeds a reduction back into x's update so the
            # loop can't CSE; x stays the big tensor
            def many(x0, w0):
                def body(i, v):
                    y = fn(v, w0)
                    g = jnp.mean(y.astype(jnp.float32))
                    return v * jnp.asarray(0.999, v.dtype) + g.astype(v.dtype)
                return jax.lax.fori_loop(0, ITERS, body, x0)

            f = jax.jit(many)
            _ = np.asarray(f(x, wk)[0, :2, :2, :2])
            t0 = time.perf_counter()
            _ = np.asarray(f(x, wk)[0, :2, :2, :2])
            dt = (time.perf_counter() - t0) / ITERS
            line = f"  {name:10s} fwd {dt*1e6:9.1f} us"

            if B <= 2:
                cot = jnp.asarray(
                    rng.randn(B, H, W, Cout).astype(np.float32), dtype)

                def many_g(x0, w0):
                    def body(i, carry):
                        v, wv = carry
                        gx, gw = jax.grad(
                            lambda a, b: (fn(a, b) * cot).sum(),
                            (0, 1))(v, wv)
                        return (v * jnp.asarray(0.999, v.dtype)
                                + gx.astype(v.dtype)
                                * jnp.asarray(0.01, v.dtype),
                                wv + gw.astype(wv.dtype) * 1e-6)
                    return jax.lax.fori_loop(0, ITERS, body, (x0, w0))

                g = jax.jit(many_g)
                _ = np.asarray(g(x, wk)[0][0, :2, :2, :2])
                t0 = time.perf_counter()
                _ = np.asarray(g(x, wk)[0][0, :2, :2, :2])
                dtg = (time.perf_counter() - t0) / ITERS
                line += f"   fwd+bwd {dtg*1e6:9.1f} us"
            print(line)

            yf = np.asarray(jax.jit(fn)(x, wk), np.float32)
            if ref_f is None:
                ref_f = yf
            else:
                err = np.abs(yf - ref_f).max() / (np.abs(ref_f).max() + 1e-9)
                print(f"             max rel err vs xla_conv: {err:.2e}")


if __name__ == "__main__":
    main()
