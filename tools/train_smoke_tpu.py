"""Flagship train-step smoke on the real TPU: compiles the full jitted
G+D step from options/train.yml (reference recipe: 256², batch 4/chip,
Adam 8e-5) on synthetic data and reports steady-state step time.

Usage: python tools/train_smoke_tpu.py [steps] [batch]
"""
import os
import sys
import time
from os import path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/samt_jax_cache")

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4

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

    opt = parse(osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                         "options", "train.yml"), is_train=True)
    if os.environ.get("SAMT_TRAIN_BF16"):
        opt["train"]["compute_dtype"] = "bfloat16"
        print("mixed precision: bfloat16 generator fwd + VGG pyramid")
    trainer = Trainer(opt)

    rng = np.random.RandomState(0)
    batch_data = {
        "source": jnp.asarray(
            rng.randn(batch, 256, 256, 3).astype(np.float32) * 0.3),
        "driving": jnp.asarray(
            rng.randn(batch, 256, 256, 3).astype(np.float32) * 0.3),
    }
    t0 = time.perf_counter()
    state, vgg_params = trainer.init_state(jax.random.PRNGKey(0), batch_data)
    print(f"init_state: {time.perf_counter()-t0:.1f}s")

    step_fn = jax.jit(trainer.make_train_step(), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, logs = step_fn(state, batch_data, key, vgg_params)
    logs = jax.device_get(logs)
    print(f"first step (compile): {time.perf_counter()-t0:.1f}s  "
          f"l_g_total={float(logs['l_g_total']):.3f}")

    times = []
    for i in range(steps):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        state, logs = step_fn(state, batch_data, key, vgg_params)
        logs = jax.device_get(logs)  # fetch forces completion on axon
        times.append(time.perf_counter() - t0)
    logs = {k: round(float(v), 4) for k, v in sorted(logs.items())}
    best = min(times)
    print(f"steady step: best {best*1e3:.0f} ms "
          f"({batch/best:.2f} samples/s/chip), all "
          f"{[round(t, 2) for t in times]}")
    print(f"logs: {logs}")
    nonfinite = [k for k, v in logs.items() if not np.isfinite(v)]
    assert not nonfinite, f"non-finite logs: {nonfinite}"
    print("TRAIN SMOKE OK")


if __name__ == "__main__":
    main()
