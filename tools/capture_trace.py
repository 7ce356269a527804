"""Capture a device trace of one gen step and print the top ops by time.

Uses jax.profiler + tensorboard_plugin_profile's converters to extract an
op-level breakdown without a TensorBoard UI.
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/samt_jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from synergize_motion_appearance_tpu.inference import ReenactmentPipeline
    from synergize_motion_appearance_tpu.models import build_network
    from __graft_entry__ import _flagship_config

    fb = int(os.environ.get("BENCH_FRAME_BATCH", "64"))
    cfg = _flagship_config(256)
    net_g = build_network(cfg["network_g"])
    me = build_network(cfg["network_motion_estimator"])
    rng = np.random.RandomState(0)
    source = (rng.rand(1, 256, 256, 3) * 255).astype(np.uint8)
    driving = (rng.rand(max(fb, 64), 256, 256, 3) * 255).astype(np.uint8)

    s32 = jnp.asarray(source, jnp.float32) / 127.5 - 1
    d32 = jnp.asarray(driving[:1], jnp.float32) / 127.5 - 1
    m_vars = jax.jit(me.init)(jax.random.PRNGKey(0), d32, s32)
    dm = jax.jit(me.apply)(m_vars, d32, s32)
    g_vars = jax.jit(lambda k, a, b: net_g.init(k, a, b, inference=True))(
        jax.random.PRNGKey(1), s32, dm)

    p = ReenactmentPipeline(net_g, me, g_vars, m_vars, relative=True,
                            adapt_scale=True, frame_batch=fb, u8_io=True,
                            host_kp_downsample=True)
    # warm up / compile
    _ = p.animate(source, driving)

    logdir = "/tmp/samt_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    out = p.animate(source, driving)
    jax.profiler.stop_trace()
    print("trace captured; frames:", out.shape)

    # find the xplane file and extract op stats
    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "framework_op_stats^", {}
        )
        # data is a CSV/JSON blob depending on version
        out_path = "/tmp/samt_trace/op_stats.txt"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out_path, mode) as f:
            f.write(data)
        print("wrote", out_path)
        txt = data.decode() if isinstance(data, bytes) else data
        lines = txt.splitlines()
        print("\n".join(lines[:40]))
    except Exception as e:
        print("op stats extraction failed:", type(e).__name__, e)


if __name__ == "__main__":
    main()
