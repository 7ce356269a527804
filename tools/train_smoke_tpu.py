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
    if os.environ.get("SAMT_TRAIN_F32"):
        opt["train"].pop("compute_dtype", None)
        print("full f32 step (compute_dtype removed)")
    if os.environ.get("SAMT_REMAT") is not None:
        v = os.environ["SAMT_REMAT"]
        opt["train"]["remat"] = v if v == "selective" else bool(int(v))
        print(f"remat = {opt['train']['remat']}")
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
    hist = {"l_g_total": [], "l_g_pix": [], "l_d_real": []}
    for i in range(steps):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        state, logs = step_fn(state, batch_data, key, vgg_params)
        logs = jax.device_get(logs)  # fetch forces completion on axon
        times.append(time.perf_counter() - t0)
        for k in hist:
            if k in logs:
                hist[k].append(float(logs[k]))
        if steps > 20 and (i + 1) % max(1, steps // 10) == 0:
            print(f"  step {i+1}: l_g_total={float(logs['l_g_total']):.3f}"
                  f" l_g_pix={float(logs['l_g_pix']):.4f}"
                  f" ({(time.perf_counter()-t0)*1e3:.0f} ms)", flush=True)
    logs = {k: round(float(v), 4) for k, v in sorted(logs.items())}
    best = min(times)
    med = sorted(times)[len(times) // 2]
    print(f"steady step: best {best*1e3:.0f} ms, median {med*1e3:.0f} ms "
          f"({batch/best:.2f} samples/s/chip best)")

    # chained timing: enqueue CH steps, fetch ONCE — the per-step loop
    # above pays a ~50 ms relay round-trip per step (axon dev link),
    # which real training (log every N steps) does not; this is the
    # number that matches on-device step time.
    ch = max(4, min(steps, 16))
    key2 = jax.random.fold_in(key, 999)
    t0 = time.perf_counter()
    for i in range(ch):
        key2 = jax.random.fold_in(key2, i)
        state, logs_c = step_fn(state, batch_data, key2, vgg_params)
    _ = float(jax.device_get(logs_c["l_g_total"]))
    chained = (time.perf_counter() - t0) / ch
    print(f"chained step: {chained*1e3:.0f} ms/step over {ch} "
          f"({batch/chained:.2f} samples/s/chip)")
    try:
        ms = jax.devices()[0].memory_stats()
        print(f"hbm peak: {ms['peak_bytes_in_use']/2**30:.2f} GiB "
              f"(limit {ms.get('bytes_limit', 0)/2**30:.2f})")
    except Exception:
        pass
    try:
        from tools.flops_report import (TRAIN_STEP_FLOPS_PER_SAMPLE,
                                        _device_peak_flops)

        peak = _device_peak_flops()
        if peak:
            print(f"train MFU (median step): "
                  f"{batch * TRAIN_STEP_FLOPS_PER_SAMPLE / med / peak:.3f}"
                  f"  (chained: "
                  f"{batch * TRAIN_STEP_FLOPS_PER_SAMPLE / chained / peak:.3f})")
    except Exception:
        pass
    print(f"logs: {logs}")
    nonfinite = [k for k, v in logs.items() if not np.isfinite(v)]
    assert not nonfinite, f"non-finite logs: {nonfinite}"
    if steps >= 100:
        # same fixed batch every step -> this is a flagship-shape overfit
        # run; the loss must actually DECREASE (convergence evidence at
        # full scale, not just the tiny-config test)
        t0m = np.mean(hist["l_g_total"][:10])
        t1m = np.mean(hist["l_g_total"][-10:])
        p0m = np.mean(hist["l_g_pix"][:10])
        p1m = np.mean(hist["l_g_pix"][-10:])
        print(f"convergence: l_g_total {t0m:.3f} -> {t1m:.3f}, "
              f"l_g_pix {p0m:.4f} -> {p1m:.4f}")
        assert t1m < t0m and p1m < p0m, "flagship overfit did not converge"
    print("TRAIN SMOKE OK")


if __name__ == "__main__":
    main()
