"""Same-day A/B of the W-in-lanes layout in the TRAIN graph (PERF.md §17).

Runs `tools/train_smoke_tpu.py` — the exact §10 recipe: single donated
state, chained dispatches fetched once — in subprocesses with
SAMT_WL_TRAIN flipped, interleaved nhwc→wl→nhwc→wl so both variants
sample the same link/session weather and the later passes run fully
from the persistent compile cache (pure measurement, no compile skew).
A single-process two-executable A/B was tried first and OOMs: the
b8-selective step peaks near the 16G HBM limit with ONE resident state
(§10), and a second variant's state copy pushes it over.

The comparison metric is the CHAINED step time (device-bound, relay
round-trips amortized out), which is what §10/§11 record.

Usage: python tools/bench_wl_train.py [batch=8] [remat=selective] [steps=8]
"""
import json
import os
import re
import subprocess
import sys
from os import path as osp

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def run_variant(name, flag, batch, remat, steps):
    env = dict(os.environ)
    env["SAMT_WL_TRAIN"] = flag
    env["SAMT_REMAT"] = remat
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/samt_jax_cache")
    p = subprocess.run(
        [sys.executable, osp.join(ROOT, "tools", "train_smoke_tpu.py"),
         str(steps), str(batch)],
        env=env, capture_output=True, text=True, cwd=ROOT)
    out = p.stdout + p.stderr
    m = re.search(r"chained step: (\d+) ms/step", out)
    m2 = re.search(r"steady step: best (\d+) ms, median (\d+) ms", out)
    m3 = re.search(r"l_g_total=([\d.]+)", out)
    if p.returncode != 0 or not m:
        print(out[-3000:])
        raise SystemExit(f"{name} run failed (rc={p.returncode})")
    return {"chained_ms": int(m.group(1)),
            "steady_best_ms": int(m2.group(1)) if m2 else None,
            "step1_loss": float(m3.group(1)) if m3 else None}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    remat = sys.argv[2] if len(sys.argv) > 2 else "selective"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    passes = int(os.environ.get("WLAB_PASSES", "2"))

    results = {"nhwc": [], "wl": []}
    for p in range(passes):
        for name, flag in (("nhwc", "0"), ("wl", "1")):
            r = run_variant(name, flag, batch, remat, steps)
            results[name].append(r)
            print(f"pass {p} {name}: chained {r['chained_ms']} ms/step "
                  f"(steady best {r['steady_best_ms']} ms, "
                  f"step1 l_g_total={r['step1_loss']})", flush=True)

    summary = {}
    for name in ("nhwc", "wl"):
        ch = [r["chained_ms"] for r in results[name]]
        summary[name] = {"chained_ms": ch, "best_ms": min(ch)}
    ratio = summary["nhwc"]["best_ms"] / summary["wl"]["best_ms"]
    l_n = results["nhwc"][0]["step1_loss"]
    l_w = results["wl"][0]["step1_loss"]
    dev = None if l_n is None or l_w is None else round(abs(l_n - l_w), 6)
    print(json.dumps({"batch": batch, "remat": remat, "steps": steps,
                      "passes": passes, "step1_loss_dev": dev,
                      **summary, "wl_speedup": round(ratio, 4)}))


if __name__ == "__main__":
    main()
