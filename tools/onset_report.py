"""Digest a train.py log into D-onset crossing evidence.

Parses MessageLogger lines (utils/logger.py:56-83 format) from one or
more log files, extracts the GAN-dynamics series (d_weight, l_d_real,
l_d_fake, out_d_real, out_d_fake, l_g_gan, l_g_total, l_g_pix,
step_skipped_nonfinite), and prints a windowed markdown table plus a
stability verdict around the net_d_start_iter boundary (reference:
options/train.yml:194 — D turns on at iter 5001,
appmotioncomp_model.py:325-345 — adaptive d_weight + hinge D).

Usage:
  python tools/onset_report.py LOGFILE [LOGFILE...] [--onset 5001]
      [--window 500]
"""
import argparse
import re
import sys

import numpy as np

KEYS = ["l_g_total", "l_g_pix", "l_g_percep", "l_g_gan", "d_weight",
        "l_d_real", "l_d_fake", "out_d_real", "out_d_fake",
        "step_skipped_nonfinite"]

_ITER_RE = re.compile(r"iter:\s*([\d,]+)")
_KV_RE = re.compile(r"(\w+): ([-+\d.e]+)")


def parse_logs(paths):
    series = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                m = _ITER_RE.search(line)
                if not m or "l_g_total" not in line:
                    continue
                it = int(m.group(1).replace(",", ""))
                rec = {}
                for k, v in _KV_RE.findall(line):
                    if k in KEYS:
                        try:
                            rec[k] = float(v)
                        except ValueError:
                            pass
                if rec:
                    series[it] = rec  # later files override (resume)
    return dict(sorted(series.items()))


def window_table(series, window):
    iters = np.array(list(series))
    rows = []
    lo = 0
    while lo < iters.max():
        hi = lo + window
        sel = [series[i] for i in iters[(iters > lo) & (iters <= hi)]]
        if sel:
            row = {"window": f"{lo+1}-{hi}"}
            for k in KEYS:
                vals = [r[k] for r in sel if k in r]
                row[k] = float(np.mean(vals)) if vals else None
            rows.append(row)
        lo = hi
    return rows


def fmt(v):
    if v is None:
        return "—"
    if v == 0:
        return "0"
    return f"{v:.3g}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--onset", type=int, default=5001)
    ap.add_argument("--window", type=int, default=500)
    args = ap.parse_args()

    series = parse_logs(args.logs)
    if not series:
        raise SystemExit("no MessageLogger lines found")
    iters = np.array(list(series))
    print(f"parsed {len(series)} log points, iters {iters.min()}"
          f"-{iters.max()}\n")

    cols = ["window"] + KEYS
    rows = window_table(series, args.window)
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(fmt(r.get(c)) if c != "window"
                                else r["window"] for c in cols) + " |")

    # ---- verdict ----
    pre = [series[i] for i in iters if i <= args.onset]
    post = [series[i] for i in iters if i > args.onset]
    print()
    problems = []
    skips = sum(r.get("step_skipped_nonfinite", 0) for r in series.values())
    print(f"step_skipped_nonfinite total: {int(skips)}")
    if skips:
        problems.append(f"{int(skips)} nonfinite-skipped steps")
    if not post:
        problems.append("no post-onset points")
    else:
        dw = [r["d_weight"] for r in post if "d_weight" in r]
        pre_dw = [r["d_weight"] for r in pre if "d_weight" in r]
        if pre_dw and max(pre_dw) > 0:
            problems.append("d_weight nonzero BEFORE onset")
        if dw and max(dw) == 0:
            problems.append("d_weight never turned on after onset")
        # hinge-D health: both branches should stay bounded (no
        # collapse to 0 or blowup) in the last quarter of the run
        tail = post[-max(1, len(post) // 4):]
        for k in ("l_d_real", "l_d_fake"):
            vals = [r[k] for r in tail if k in r]
            if vals and not (1e-4 < np.mean(vals) < 10.0):
                problems.append(
                    f"{k} tail mean {np.mean(vals):.3g} out of [1e-4,10]")
        tot = [r["l_g_total"] for r in post if "l_g_total" in r]
        if tot and not np.isfinite(tot).all():
            problems.append("non-finite l_g_total post-onset")
        pre_pix = [r["l_g_pix"] for r in pre[-10:] if "l_g_pix" in r]
        post_pix = [r["l_g_pix"] for r in post[-10:] if "l_g_pix" in r]
        if pre_pix and post_pix and np.mean(post_pix) > 3 * np.mean(pre_pix):
            problems.append(
                f"l_g_pix degraded >3x after onset "
                f"({np.mean(pre_pix):.4f} -> {np.mean(post_pix):.4f})")
    if problems:
        print("VERDICT: UNSTABLE — " + "; ".join(problems))
        sys.exit(1)
    print("VERDICT: STABLE through D-onset — d_weight gated exactly at "
          f"{args.onset}, hinge-D branches bounded, zero skipped steps, "
          "pixel loss did not degrade")


if __name__ == "__main__":
    main()
