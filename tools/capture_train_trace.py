"""Capture a device trace of ONE flagship train step and print the
per-op breakdown (via tools/parse_xplane.py).

Complements tools/train_breakdown.py (phase-level differential timing)
with op-level attribution: which HLO ops consume the G-backward bucket
(reference step semantics: appmotioncomp_model.py:294-434).

Env: SAMT_TRAIN_F32=1 to trace the f32 step instead of the bf16 recipe
default. Usage: python tools/capture_train_trace.py [batch=2]
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

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from synergize_motion_appearance_tpu.training import Trainer
    from synergize_motion_appearance_tpu.utils.options import parse

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    opt = parse(osp.join(ROOT, "options", "train.yml"), is_train=True)
    if os.environ.get("SAMT_TRAIN_F32"):
        opt["train"].pop("compute_dtype", None)
    if os.environ.get("SAMT_REMAT") is not None:
        v = os.environ["SAMT_REMAT"]
        opt["train"]["remat"] = v if v == "selective" else bool(int(v))
    trainer = Trainer(opt)

    rng = np.random.RandomState(0)
    batch = {
        "source": jnp.asarray(
            rng.randn(batch_size, 256, 256, 3).astype(np.float32) * 0.3),
        "driving": jnp.asarray(
            rng.randn(batch_size, 256, 256, 3).astype(np.float32) * 0.3),
    }
    t0 = time.perf_counter()
    state, vgg_params = trainer.init_state(jax.random.PRNGKey(0), batch)
    print(f"init_state: {time.perf_counter()-t0:.1f}s", flush=True)

    step_fn = jax.jit(trainer.make_train_step())
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, logs = step_fn(state, batch, key, vgg_params)
    _ = float(jax.device_get(logs["l_g_total"]))
    print(f"compile+step: {time.perf_counter()-t0:.1f}s", flush=True)
    # warm steady state
    state, logs = step_fn(state, batch, jax.random.fold_in(key, 1),
                          vgg_params)
    _ = float(jax.device_get(logs["l_g_total"]))

    logdir = "/tmp/samt_train_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for i in range(2, 4):
        state, logs = step_fn(state, batch, jax.random.fold_in(key, i),
                              vgg_params)
    _ = float(jax.device_get(logs["l_g_total"]))
    jax.profiler.stop_trace()
    print("trace captured:", logdir, flush=True)

    sys.argv = ["parse_xplane", logdir, "45"]
    from tools import parse_xplane
    parse_xplane.main()


if __name__ == "__main__":
    main()
