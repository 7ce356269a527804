"""A/B microbench: head-split fused attention (+ the relayouts the model
needs around it) vs the head-packed kernel, at the generator's hot
shapes (motion blocks E=32 d=4; app blocks E=256 d=32; fb=64 frames,
L=K=1024 tokens).

The old path's real cost includes the (B, L, E) -> (B, H, L, d)
transposes of q/k/v and the merge back — lane-padded 128/d x in HBM —
so the A side times relayout + kernel + merge, matching what
`MultiheadAttention` actually executed.

Usage: python tools/bench_attention_packed.py [iters=30]
"""
import sys
import time
from os import path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from synergize_motion_appearance_tpu.ops.fused_attention import (
    _fused_attention_pallas,
    _fused_attention_packed_pallas,
)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), out)
    np.asarray(jax.device_get(out)).ravel()[:1]  # force fetch (axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(out)).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1e6


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    B, L, K = 64, 1024, 1024
    for E, H, shared in ((32, 8, True), (256, 8, True), (32, 8, False),
                         (256, 8, False)):
        d = E // H
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, L, E), jnp.bfloat16)
        kshape = (1, K, E) if shared else (B, K, E)
        k = jax.random.normal(ks[1], kshape, jnp.bfloat16)
        v = jax.random.normal(ks[2], kshape, jnp.bfloat16)

        @jax.jit
        def headsplit(q, k, v):
            qh = q.reshape(B, L, H, d).transpose(0, 2, 1, 3)
            kb = k.shape[0]
            kh = k.reshape(kb, K, H, d).transpose(0, 2, 1, 3)
            vh = v.reshape(kb, K, H, d).transpose(0, 2, 1, 3)
            o = _fused_attention_pallas(qh, kh, vh, None)
            return o.transpose(0, 2, 1, 3).reshape(B, L, E)

        @jax.jit
        def packed(q, k, v):
            return _fused_attention_packed_pallas(
                H, q, k[0] if shared else k, v[0] if shared else v, None)

        t_old = timeit(headsplit, q, k, v, iters=iters)
        t_new = timeit(packed, q, k, v, iters=iters)
        a = np.asarray(jax.device_get(headsplit(q, k, v)), np.float32)
        b = np.asarray(jax.device_get(packed(q, k, v)), np.float32)
        err = np.max(np.abs(a - b))
        print(f"E={E:4d} d={d:3d} shared={int(shared)}: "
              f"headsplit {t_old:8.0f} us   packed {t_new:8.0f} us "
              f"({t_old / t_new:4.2f}x)   max|diff|={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
