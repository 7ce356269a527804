"""Same-day A/B of the layout-copy attacks from the §18 hunt (PERF.md).

Two candidate fixes for the b8-selective step's data-formatting bucket
(61 ms/step at HEAD, dominated by WL region-boundary transposes):

  * SAMT_WL_EDGE  — remat-save the to_wl/from_wl boundary transposes
    ("wl_edge" checkpoint_name) so the backward's re-forward doesn't
    repeat the layout copies;
  * SAMT_WL_XLR   — run the parallel low-res decode (train-only, ref
    appmotioncodebook_arch.py:651/658-659) in the SAME W-in-lanes
    layout as the main stream, so the shared decoder blocks don't get
    two disagreeing layout assignments.

Protocol mirrors tools/bench_wl_train.py: each variant is the exact
§10 recipe process (`train_smoke_tpu.py` — single donated state,
chained dispatches fetched once), variants interleaved per pass so all
sample the same session weather; pass 2+ runs fully from the
persistent compile cache. Comparison metric: CHAINED step time.

Usage: python tools/bench_copy_hunt.py [batch=8] [remat=selective] [steps=8]
"""
import json
import os
import re
import subprocess
import sys
from os import path as osp

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

VARIANTS = (
    ("base", {"SAMT_WL_EDGE": "0", "SAMT_WL_XLR": "0", "SAMT_VGG_DT": "0"}),
    ("edge", {"SAMT_WL_EDGE": "1", "SAMT_WL_XLR": "0", "SAMT_VGG_DT": "0"}),
    ("xlr", {"SAMT_WL_EDGE": "0", "SAMT_WL_XLR": "1", "SAMT_VGG_DT": "0"}),
    ("vgg", {"SAMT_WL_EDGE": "0", "SAMT_WL_XLR": "0", "SAMT_VGG_DT": "1"}),
    # the shipped default (edge+xlr on) — measured as a combination, not
    # inferred from the isolations
    ("edge_xlr",
     {"SAMT_WL_EDGE": "1", "SAMT_WL_XLR": "1", "SAMT_VGG_DT": "0"}),
)


def run_variant(name, flags, batch, remat, steps):
    env = dict(os.environ)
    env.update(flags)
    env["SAMT_REMAT"] = remat
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/samt_jax_cache")
    p = subprocess.run(
        [sys.executable, osp.join(ROOT, "tools", "train_smoke_tpu.py"),
         str(steps), str(batch)],
        env=env, capture_output=True, text=True, cwd=ROOT)
    out = p.stdout + p.stderr
    m = re.search(r"chained step: (\d+) ms/step", out)
    m3 = re.search(r"l_g_total=([\d.]+)", out)
    m4 = re.search(r"hbm peak: ([\d.]+) GiB", out)
    if p.returncode != 0 or not m:
        print(out[-3000:])
        return None
    return {"chained_ms": int(m.group(1)),
            "step1_loss": float(m3.group(1)) if m3 else None,
            "hbm_gib": float(m4.group(1)) if m4 else None}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    remat = sys.argv[2] if len(sys.argv) > 2 else "selective"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    passes = int(os.environ.get("HUNT_PASSES", "2"))
    # HUNT_VARIANTS=base,xlr,vgg limits the sweep (e.g. at b2 remat-off
    # the wl_edge checkpoint name is inert, so edge variants are
    # redundant compiles)
    sel = os.environ.get("HUNT_VARIANTS")
    variants = tuple(v for v in VARIANTS
                     if sel is None or v[0] in sel.split(","))

    results = {name: [] for name, _ in variants}
    for p in range(passes):
        for name, flags in variants:
            r = run_variant(name, flags, batch, remat, steps)
            if r is None:  # transient relay/AOT failures happen; retry
                print(f"pass {p} {name}: FAILED, retrying once",
                      flush=True)
                r = run_variant(name, flags, batch, remat, steps)
            if r is None:
                raise SystemExit(f"{name} failed twice")
            results[name].append(r)
            print(f"pass {p} {name}: chained {r['chained_ms']} ms/step "
                  f"(step1 l_g_total={r['step1_loss']}, "
                  f"hbm {r['hbm_gib']} GiB)", flush=True)

    summary = {}
    base_loss = results["base"][0]["step1_loss"]
    for name, _ in variants:
        ch = [r["chained_ms"] for r in results[name]]
        loss = results[name][0]["step1_loss"]
        dev = (None if base_loss is None or loss is None
               else round(abs(loss - base_loss), 6))
        summary[name] = {"chained_ms": ch, "best_ms": min(ch),
                         "loss_dev": dev,
                         "hbm_gib": results[name][0]["hbm_gib"]}
    print(json.dumps({"batch": batch, "remat": remat, "steps": steps,
                      "passes": passes, **summary}))


if __name__ == "__main__":
    main()
