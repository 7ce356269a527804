"""Microbench: 3x3 conv strategies at the decoder's hot shapes on TPU.

Times XLA's native conv vs the matmul re-expressions in ops/fast_conv.py.
Timing protocol per tpu-perf notes: the axon relay's block_until_ready
does not block — every timed iteration fetches a tiny slice of a FRESH
output to force completion; many inner iterations amortize the 64 ms RTT.

Usage: python tools/bench_conv3x3.py  (repo root; real TPU)
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

    from synergize_motion_appearance_tpu.ops.fast_conv import (
        conv3x3_im2col, conv3x3_tapsum,
    )

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    SHAPES = [
        (16, 256, 256, 64, 64),    # decoder 256-scale ResBlock convs
        (16, 128, 128, 128, 128),  # decoder 128-scale
        (16, 64, 64, 128, 128),    # decoder 64-scale
    ]
    ITERS = int(os.environ.get("CONVBENCH_ITERS", "30"))
    dtype = jnp.bfloat16

    def xla_conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (y + b.astype(y.dtype)).astype(x.dtype)

    def batch_in_height(x, w, b):
        """Merge batch into height with 2-row zero separators so one
        batch-1 tall conv (VALID) computes all images — different XLA
        emitter path than the batched NHWC conv."""
        B, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        tall = xp.reshape(B * (H + 2), W + 2, C)[None]
        y = jax.lax.conv_general_dilated(
            tall, w.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # (1, B*(H+2)-2, W, Cout): restore band alignment then drop the
        # 2 seam rows per image
        y = jnp.pad(y, ((0, 0), (0, 2), (0, 0), (0, 0)))
        y = y.reshape(B, H + 2, W, -1)[:, :H]
        # rows computed across image seams are garbage; the reshape
        # above drops the 2 seam rows per image ([:, :H] keeps rows
        # 0..H-1 of each (H+2)-row band = the valid ones)
        return (y + b.astype(y.dtype)).astype(x.dtype)

    def nchw_conv(x, w, b):
        xt = x.transpose(0, 3, 1, 2)
        y = jax.lax.conv_general_dilated(
            xt, w.astype(x.dtype).transpose(3, 2, 0, 1), (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return (y.transpose(0, 2, 3, 1)
                + b.astype(y.dtype)).astype(x.dtype)

    variants = {
        "xla_conv": xla_conv,
        "im2col": conv3x3_im2col,
        "tapsum": conv3x3_tapsum,
        "batch_in_h": batch_in_height,
        "nchw": nchw_conv,
    }

    for (B, H, W, Cin, Cout) in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32),
                        dtype)
        wk = jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32)
                         * 0.05, dtype)
        b = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.01, dtype)
        print(f"\n== ({B},{H},{W},{Cin})->{Cout} bf16, {ITERS} iters")
        ref = None
        for name, fn in variants.items():
            # chain iterations so device work is contiguous; scale input
            # slightly each round to defeat CSE
            def many(x0, w0, b0):
                def body(i, v):
                    return fn(v, w0, b0) * jnp.asarray(0.999, v.dtype) \
                        + x0 * jnp.asarray(0.01, v.dtype)
                return jax.lax.fori_loop(0, ITERS, body, x0)

            f = jax.jit(many)
            out = np.asarray(f(x, wk, b)[0, :2, :2, :2])  # warmup+fetch
            t0 = time.perf_counter()
            out = f(x, wk, b)
            _ = np.asarray(out[0, :2, :2, :2])  # force completion
            dt = (time.perf_counter() - t0) / ITERS
            gb = (2 * B * H * W * (Cin + Cout)) * 2 / 1e9
            fl = 2 * B * H * W * 9 * Cin * Cout
            print(f"  {name:10s} {dt*1e6:9.1f} us/conv   "
                  f"{fl/dt/1e12:6.1f} TF/s   {gb/dt:6.0f} GB/s(min-io)")
            # correctness vs xla conv (single application)
            y = np.asarray(jax.jit(fn)(x, wk, b), np.float32)
            if ref is None:
                ref = y
            else:
                err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
                print(f"             max rel err vs xla_conv: {err:.2e}")


if __name__ == "__main__":
    main()
