"""Measure conv3x3_wl (W-in-lanes Pallas) vs XLA's NHWC conv at the
decoder-dominant shapes (PERF.md §4 protocol: self-chained conv, no
timing epilogue; bf16).

Usage: python tools/bench_conv_wl.py [iters]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from synergize_motion_appearance_tpu.ops.pallas_conv_wl import conv3x3_wl


def timed(fn, x, iters):
    y = fn(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    y.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    shapes = [
        (16, 256, 256, 64, 64),
        (16, 128, 128, 128, 128),
        (16, 64, 64, 128, 128),
    ]
    for B, H, W, C, Co in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, C, Co) / np.sqrt(9 * C),
                        jnp.bfloat16)
        b = jnp.zeros((Co,), jnp.bfloat16)

        conv_x = jax.jit(lambda t: jax.lax.conv_general_dilated(
            t, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)
        t_xla = timed(conv_x, x, iters)

        xt = jnp.asarray(np.transpose(np.asarray(
            rng.randn(B, H, C, W)), (0, 1, 2, 3)), jnp.bfloat16)
        flops = B * H * W * 9 * C * Co * 2
        print(f"({B},{H},{W},{C})->{Co}: xla {t_xla:9.1f} us "
              f"({flops / t_xla / 1e6:.1f} TF/s)")
        for br in (8, 16, 32, 64):
            if H % br:
                continue
            try:
                f = jax.jit(lambda t, br=br: conv3x3_wl(t, w, b,
                                                        block_rows=br))
                t_wl = timed(f, xt, iters)
                print(f"    wl br={br:2d}: {t_wl:9.1f} us "
                      f"({flops / t_wl / 1e6:.1f} TF/s)")
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print(f"    wl br={br:2d}: FAILED {msg}")

        # numerics spot-check at this shape (one pass, vs lax.conv)
        ref = conv_x(x)
        got = conv3x3_wl(x.transpose(0, 1, 3, 2), w, b,
                         block_rows=8).transpose(0, 1, 3, 2)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"    max abs err vs lax.conv: {err:.3e}")


if __name__ == "__main__":
    main()
