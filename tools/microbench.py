"""Fetch-forced microbenchmarks of the suspected hot ops on the TPU.

The axon backend's block_until_ready doesn't block, so every timing
fetches a scalar from a fresh output (adds one round-trip, measured by
the no-op baseline and subtracted).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/samt_jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from synergize_motion_appearance_tpu.ops import (
        grid_sample, resize_bilinear,
    )

    F = 16
    key = jax.random.PRNGKey(0)

    def bench(name, fn, *args, n=8):
        out = fn(*args)
        _ = np.asarray(out.reshape(-1)[0])  # compile+warm
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            _ = np.asarray(out.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:55s} {dt:8.2f} ms")
        return dt

    noop = jax.jit(lambda x: x + 1.0)
    base = bench("noop roundtrip baseline", noop, jnp.zeros((8, 128)))

    # warps at each scale (bf16 feats, f32 grids)
    for (h, c) in [(64, 3), (32, 256), (64, 128), (128, 128), (256, 64)]:
        img = jax.random.normal(key, (F, h, h, c), jnp.bfloat16)
        grid = jax.random.uniform(key, (F, h, h, 2), jnp.float32, -1, 1)
        bench(f"grid_sample (F={F},{h}x{h},{c}ch)",
              jax.jit(grid_sample), img, grid)

    # 16-way sparse warp (dense motion): B=F*16 at 64x64x3
    img = jax.random.normal(key, (F * 16, 64, 64, 3), jnp.bfloat16)
    grid = jax.random.uniform(key, (F * 16, 64, 64, 2), jnp.float32, -1, 1)
    bench("grid_sample sparse (F*16,64,64,3)", jax.jit(grid_sample),
          img, grid)

    # conv blocks at the heavy scales
    def conv_block(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    for (h, cin, cout) in [(256, 64, 64), (128, 128, 128), (64, 128, 128),
                           (32, 256, 256)]:
        x = jax.random.normal(key, (F, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        gf = 2 * F * h * h * cin * cout * 9 / 1e9
        dt = bench(f"conv3x3 (F={F},{h}x{h},{cin}->{cout}) [{gf:.0f}GF]",
                   jax.jit(conv_block), x, w)

    # spatial attention at 32x32x256 (AttnBlock core)
    def attn(q, k, v):
        w_ = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) * (256 ** -0.5), axis=2
        )
        return jnp.einsum("bqk,bkc->bqc", w_, v)

    q = jax.random.normal(key, (F, 1024, 256), jnp.bfloat16)
    bench("spatial attn (F,1024,256)", jax.jit(attn), q, q, q)

    # resize_bilinear flow 64->256
    flow = jax.random.normal(key, (F, 64, 64, 2), jnp.float32)
    bench("resize flow 64->256", jax.jit(
        lambda f: resize_bilinear(f, (256, 256), True)), flow)

    # bilinear resize of occlusion/features 64->256 (256ch)
    feat = jax.random.normal(key, (F, 64, 64, 1), jnp.bfloat16)
    bench("resize occ 64->256", jax.jit(
        lambda f: resize_bilinear(f, (256, 256), True)), feat)

    print(f"(subtract baseline {base:.1f} ms from each)")


if __name__ == "__main__":
    main()
