"""Stage-level TPU profile of the reenactment pipeline.

Reports per-stage wall time with device-resident inputs (no host
transfers), transfer-inclusive times, XLA FLOP estimates, and a
frame-batch sweep. Drives optimization priorities for the >=60 fps goal.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/samt_jax_cache")

import numpy as np


def timeit(fn, *args, n=5):
    import jax

    fn(*args)  # warm
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from synergize_motion_appearance_tpu.inference import ReenactmentPipeline
    from synergize_motion_appearance_tpu.models import build_network
    from __graft_entry__ import _flagship_config

    fb = int(os.environ.get("BENCH_FRAME_BATCH", "16"))
    cfg = _flagship_config(256)
    net_g = build_network(cfg["network_g"])
    me = build_network(cfg["network_motion_estimator"])

    rng = np.random.RandomState(0)
    source = (rng.rand(1, 256, 256, 3).astype(np.float32) * 2 - 1)
    driving = (rng.rand(64, 256, 256, 3).astype(np.float32) * 2 - 1)

    s = jnp.asarray(source)
    d0 = jnp.asarray(driving[:1])
    m_vars = jax.jit(me.init)(jax.random.PRNGKey(0), d0, s)
    dm = jax.jit(me.apply)(m_vars, d0, s)
    g_vars = jax.jit(lambda k, a, b: net_g.init(k, a, b, inference=True))(
        jax.random.PRNGKey(1), s, dm)

    p = ReenactmentPipeline(net_g, me, g_vars, m_vars, relative=True,
                            adapt_scale=True, frame_batch=fb)

    # device-resident inputs
    src_dev = jnp.asarray(source).astype(jnp.bfloat16)
    drv_dev = jnp.asarray(driving[:fb]).astype(jnp.bfloat16)
    kp_src = p._kp_fn(s)
    kp_init = p._kp_fn(jnp.asarray(driving[:1]))
    kp_chunk = p._kp_jit(p.m_vars, drv_dev)
    kp_chunk = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32),
                                      kp_chunk)
    src_feats = p._enc_fn(s)

    t_kp = timeit(lambda: p._kp_jit(p.m_vars, drv_dev))
    t_enc = timeit(lambda: p._enc_jit(p.g_vars, src_dev))
    t_gen = timeit(lambda: p._gen_jit(p.g_vars, p.m_vars, src_dev,
                                      src_feats, kp_src, kp_chunk, kp_init))

    # transfer cost: H2D of one frame chunk + D2H of outputs
    t_h2d = timeit(lambda: jax.device_put(driving[:fb]))
    out = p._gen_jit(p.g_vars, p.m_vars, src_dev, src_feats, kp_src,
                     kp_chunk, kp_init)
    t_d2h = timeit(lambda: np.asarray(out))

    # FLOP estimate of the gen step
    lowered = jax.jit(p._gen_impl).lower(p.g_vars, p.m_vars, src_dev,
                                         src_feats, kp_src, kp_chunk,
                                         kp_init)
    cost = lowered.compile().cost_analysis()
    flops = (cost or {}).get("flops", float("nan"))

    report = {
        "frame_batch": fb,
        "kp_ms_per_frame": t_kp / fb * 1e3,
        "enc_ms_once": t_enc * 1e3,
        "gen_ms_per_frame": t_gen / fb * 1e3,
        "h2d_ms_per_frame": t_h2d / fb * 1e3,
        "d2h_ms_per_frame": t_d2h / fb * 1e3,
        "gen_gflops_per_frame": flops / fb / 1e9,
        "implied_fps_compute_only": fb / (t_gen + t_kp),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
