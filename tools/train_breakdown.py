"""Train-step time breakdown on real TPU: G-phase / D-phase / motion /
EMA attribution by differential timing (VERDICT r1 item 6).

Rather than attributing fused HLO ops to model phases (hopeless after XLA
fusion), this times nested subsets of the step as separately-jitted
functions and reports differences:

  m_fwd      — motion estimator forward only
  g_fwd      — + generator train forward (no grads)
  g_phase    — full G phase: grads of the 10-term loss wrt (g, m),
               adaptive d-weight probe, both optimizer updates
  g_ema      — + EMA update
  full       — + D phase (real/fake hinge, optimizer_d)

Timing protocol per tpu-perf notes: fetch-forced (block_until_ready does
not block through the axon relay), steady state after one warmup, chained
ITERS times inside one jit where possible — here each variant is one
dispatch, timed over N sequential dispatches with a final fetch.

Usage: python tools/train_breakdown.py [batch] (repo root, real TPU)
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

    def load_opt():
        o = parse(osp.join(ROOT, "options", "train.yml"), is_train=True)
        # train.yml defaults to bf16 mixed precision; SAMT_TRAIN_F32=1
        # measures the f32 step instead (reference-exact numerics)
        if os.environ.get("SAMT_TRAIN_F32"):
            o["train"].pop("compute_dtype", None)
        elif os.environ.get("SAMT_TRAIN_BF16"):
            o["train"]["compute_dtype"] = "bfloat16"
        return o

    opt = load_opt()
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

    me, g = trainer.motion_estimator, trainer.net_g

    def m_fwd(state, batch):
        vars_m = {"params": state.params_m,
                  "batch_stats": state.stats_m}
        dm, _ = me.apply(vars_m, batch["driving"], batch["source"],
                         train=True, mutable=["batch_stats"])
        return dm["deformation"]

    def g_fwd(state, batch):
        vars_m = {"params": state.params_m,
                  "batch_stats": state.stats_m}
        dm, _ = me.apply(vars_m, batch["driving"], batch["source"],
                         train=True, mutable=["batch_stats"])
        out = g.apply({"params": state.params_g}, batch["source"], dm,
                      w=1.0, gt=batch["driving"])
        return out["out"]

    full_step = trainer.make_train_step()

    # isolate phases via config clones
    def make(d_start, ema):
        o = load_opt()
        o["train"]["net_d_start_iter"] = d_start
        if not ema:
            o["train"]["ema_decay"] = 0.0
        t = Trainer(o)
        return t.make_train_step()

    g_only_noema = make(10**9, ema=False)   # D gated off, no EMA
    g_only = make(10**9, ema=True)          # D gated off, EMA on

    # the D phase is a lax.cond on state.step > net_d_start_iter (5001 in
    # the recipe): time the SAME compiled step from a post-gate state to
    # include it, no recompile needed
    import dataclasses

    state_d_on = dataclasses.replace(
        state, step=jnp.asarray(10000, state.step.dtype))

    full_jit = jax.jit(full_step)  # one executable serves both gatings
    variants = [
        ("m_fwd", jax.jit(m_fwd)),
        ("g_fwd", jax.jit(g_fwd)),
        ("g_phase(no ema, no D)", jax.jit(g_only_noema)),
        ("g_phase+ema (no D)", jax.jit(g_only)),
        ("full step (D gated off)", full_jit),
        ("full step (D active)", full_jit),
    ]

    N = int(os.environ.get("BREAKDOWN_ITERS", "8"))
    key = jax.random.PRNGKey(1)

    def start_state(name):
        return state_d_on if "D active" in name else state

    def run_once(name, fn):
        if "phase" in name or "full" in name:
            st, logs = fn(start_state(name), batch, key, vgg_params)
            _ = float(jax.device_get(logs["l_g_total"]))
        else:
            _ = np.asarray(fn(state, batch))[0, 0]

    def time_n(name, fn):
        is_step = "phase" in name or "full" in name
        t0 = time.perf_counter()
        if is_step:
            st = start_state(name)
            for i in range(N):
                st, logs = fn(st, batch, jax.random.fold_in(key, i),
                              vgg_params)
            _ = float(jax.device_get(logs["l_g_total"]))
        else:
            for i in range(N):
                out = fn(state, batch)
            _ = np.asarray(out)[0, 0]
        return (time.perf_counter() - t0) / N

    # compile + warm EVERYTHING first, then time in two interleaved
    # passes and keep the min — the first timing right after a variant's
    # own compile is systematically inflated (compile-helper threads
    # still draining; measured +25% on the first-timed variant)
    for name, fn in variants:
        run_once(name, fn)
        print(f"compiled {name}", flush=True)
    results = {}
    for _pass in range(2):
        for name, fn in variants:
            dt = time_n(name, fn)
            results[name] = min(results.get(name, float("inf")), dt)
    for name, _ in variants:
        print(f"{name:26s} {results[name]*1e3:8.1f} ms", flush=True)

    full = results["full step (D active)"]
    full_noD = results["full step (D gated off)"]
    gema = results["g_phase+ema (no D)"]
    gno = results["g_phase(no ema, no D)"]
    gf = results["g_fwd"]
    mf = results["m_fwd"]
    try:
        from tools.flops_report import (TRAIN_STEP_FLOPS_PER_SAMPLE,
                                        _device_peak_flops)

        peak = _device_peak_flops()
        if peak:
            mfu = batch_size * TRAIN_STEP_FLOPS_PER_SAMPLE / full / peak
            print(f"\ntrain MFU @batch {batch_size}: {mfu:.3f}")
    except Exception:
        pass
    print(f"\nattribution: motion fwd {mf*1e3:.0f} ms | G fwd (incl "
          f"motion) {gf*1e3:.0f} ms | G bwd+opt "
          f"{(gno-gf)*1e3:.0f} ms | EMA {(gema-gno)*1e3:.0f} ms | "
          f"D phase {(full-full_noD)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
