"""W-in-lanes decoder (docs/PERF.md §15): TPU parity + device timing.

Builds the flagship 256² generator twice from the same params — NHWC
(wl_decoder=False) and W-in-lanes (wl_decoder=True) — asserts the
inference outputs match on hardware, then times the device-resident
generator step (dense-motion inputs precomputed, block_until_ready) at
a given frame batch for both layouts.

Usage: python tools/bench_wl_decoder.py [frame_batch] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/samt_jax_cache")

import numpy as np


def main():
    fb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from synergize_motion_appearance_tpu.models import build_network
    from __graft_entry__ import _flagship_config

    cfg = _flagship_config(256)
    g_off = dict(cfg["network_g"], wl_decoder=False)
    g_on = dict(cfg["network_g"], wl_decoder=True)
    net_off = build_network(g_off)
    net_on = build_network(g_on)
    me = build_network(cfg["network_motion_estimator"])

    rng = np.random.RandomState(0)
    src1 = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32) * 0.3)
    drv = jnp.asarray(rng.randn(fb, 256, 256, 3).astype(np.float32) * 0.3)
    src = jnp.broadcast_to(src1, (fb, 256, 256, 3))

    m_vars = jax.jit(me.init)(jax.random.PRNGKey(0), drv[:1], src1)
    dm = jax.jit(me.apply)(m_vars, drv, src)
    g_vars = jax.jit(
        lambda k, s, d: net_off.init(k, s, d, inference=True)
    )(jax.random.PRNGKey(1), src, dm)

    f_off = jax.jit(lambda v, s, d: net_off.apply(v, s, d,
                                                  inference=True)["out"])
    f_on = jax.jit(lambda v, s, d: net_on.apply(v, s, d,
                                                inference=True)["out"])

    def errstats(a, b):
        d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        return (float(jnp.max(d)), float(jnp.mean(d)),
                float(jnp.percentile(d, 99.9)))

    # ---- correctness gate 1: per-conv parity at the flagship WL
    # shapes, f32 @ matmul precision "highest" (true f32 on the MXU —
    # at DEFAULT, f32 matmuls run 1-pass bf16 and the two layouts round
    # differently, ~1e-2 model-level). Kernel-at-scale check; the
    # full-graph WIRING is proven exact by the CPU interpret-mode test
    # (tests/test_wl_decoder.py, 5e-5 on the tiny former).
    from synergize_motion_appearance_tpu.ops.pallas_conv_wl import (
        conv3x3_wl,
    )

    with jax.default_matmul_precision("highest"):
        for (Hc, Cc, Co) in ((256, 64, 64), (256, 128, 64),
                             (128, 128, 128), (128, 256, 128)):
            xs = jnp.asarray(
                rng.randn(2, Hc, Hc, Cc).astype(np.float32))
            ws = jnp.asarray(
                (rng.randn(3, 3, Cc, Co) / np.sqrt(9 * Cc)).astype(
                    np.float32))
            bs = jnp.asarray(rng.randn(Co).astype(np.float32))
            ref_c = jax.jit(lambda t, w, b: jax.lax.conv_general_dilated(
                t, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            )(xs, ws, bs)
            got_c = conv3x3_wl(
                jnp.swapaxes(xs, 2, 3), ws, bs, block_rows=8)
            e = float(jnp.max(jnp.abs(jnp.swapaxes(got_c, 2, 3) - ref_c)))
            scale = float(jnp.max(jnp.abs(ref_c)))
            print(f"conv {Hc}²x{Cc}->{Co} f32-highest: max err {e:.3e}"
                  f" (max|ref| {scale:.2f})")
            assert e < 1e-4 * max(scale, 1.0), "WL conv parity FAILED"

    # ---- full-model f32 at DEFAULT precision: informational (both
    # layouts' f32 matmuls are 1-pass-bf16 rounded differently)
    y_off32 = jax.block_until_ready(f_off(g_vars, src, dm))
    y_on32 = jax.block_until_ready(f_on(g_vars, src, dm))
    mx32, mn32, p32 = errstats(y_on32, y_off32)
    ref = float(jnp.max(jnp.abs(y_off32)))
    print(f"f32-default model: max {mx32:.3e}  mean {mn32:.3e}"
          f"  p99.9 {p32:.3e}  (max|out| {ref:.3e})")

    # production inference precision (ReenactmentPipeline default):
    # bf16 weights + activations — informational (different per-layer
    # bf16 roundings walk apart through the deep decoder)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, t)
    g_vars, src, dm = cast(g_vars), cast(src), cast(dm)

    t0 = time.perf_counter()
    y_off = jax.block_until_ready(f_off(g_vars, src, dm))
    print(f"compile NHWC bf16: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    y_on = jax.block_until_ready(f_on(g_vars, src, dm))
    print(f"compile WL bf16:   {time.perf_counter() - t0:.1f}s")
    mx, mn, p99 = errstats(y_on, y_off)
    print(f"bf16: max {mx:.3e}  mean {mn:.3e}  p99.9 {p99:.3e}")
    # each-vs-f32: which layout sits closer to the f32 truth
    for name, yb in (("nhwc", y_off), ("wl", y_on)):
        m, a, _ = errstats(yb, y_off32)
        print(f"bf16 {name} vs f32 truth: max {m:.3e} mean {a:.3e}")

    def bench(fn):
        jax.block_until_ready(fn(g_vars, src, dm))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(g_vars, src, dm))
            ts.append(time.perf_counter() - t0)
        return min(ts), float(np.median(ts))

    b_off, m_off = bench(f_off)
    b_on, m_on = bench(f_on)
    print(f"NHWC: best {b_off * 1e3:8.2f} ms  median {m_off * 1e3:8.2f} ms"
          f"  ({fb / b_off:6.1f} fps device)")
    print(f"WL:   best {b_on * 1e3:8.2f} ms  median {m_on * 1e3:8.2f} ms"
          f"  ({fb / b_on:6.1f} fps device)")
    print(f"speedup best-of-{iters}: {b_off / b_on:.3f}x")
    # gate 2: production bf16 — the two layouts must sit equally close
    # to the f32 reference (a WL bug would push wl's distance above
    # nhwc's own bf16 rounding distance)
    m_nh, a_nh, _ = errstats(y_off, y_off32)
    m_wl, a_wl, _ = errstats(y_on, y_off32)
    assert a_wl < 1.5 * a_nh + 1e-6, (a_wl, a_nh)
    print("parity ok (per-conv f32-highest exact; bf16 layouts "
          "equidistant from f32)")


if __name__ == "__main__":
    main()
