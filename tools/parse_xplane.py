"""Parse a jax.profiler xplane.pb and print per-op device-time totals.

The tensorboard_plugin_profile converter API is broken in this
environment, so this walks the raw XSpace proto
(tensorflow.tsl.profiler.protobuf.xplane_pb2). Only the synchronous
'XLA Ops' line of the TPU device plane is counted ('Async XLA Ops'
spans cover wait windows overlapping compute — counting them measured
5x the real step time). Per-op metadata stats provide `hlo_category`,
`source` (file:line), `flops`, and `bytes_accessed`, so output is
aggregated three ways: by HLO category, by source line, and top ops —
with achieved FLOP/s / GB/s per entry for roofline placement
(docs/PERF.md).

Usage: python tools/parse_xplane.py [trace_dir=/tmp/samt_trace] [top_n=30]
"""
import collections
import glob
import sys


def load_xspace(trace_dir):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # older/newer layout
        from tensorflow.core.profiler.protobuf import xplane_pb2
    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_rows(xs):
    """[(name, total_ps, category, source, flops, bytes)] per op."""
    rows = {}
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        smeta = {m.id: m.name for m in plane.stat_metadata.values()}
        emeta = {m.id: m for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                em = emeta.get(ev.metadata_id)
                if em is None:
                    continue
                key = ev.metadata_id
                if key not in rows:
                    stats = {smeta.get(s.metadata_id): s for s in em.stats}

                    def sval(n, d=""):
                        s = stats.get(n)
                        return s.str_value if s is not None else d

                    def ival(n):
                        s = stats.get(n)
                        return s.int64_value if s is not None else 0

                    rows[key] = {
                        "name": em.display_name or em.name.split(" =")[0],
                        "ps": 0,
                        "cat": sval("hlo_category", "?"),
                        "src": sval("source", "?"),
                        "flops": ival("flops"),
                        "bytes": ival("bytes_accessed"),
                        "n": 0,
                    }
                rows[key]["ps"] += ev.duration_ps
                rows[key]["n"] += 1
    return list(rows.values())


def _rate(r):
    """Achieved TFLOP/s and GB/s strings for one aggregate row."""
    secs = r["ps"] / 1e12
    if secs <= 0:
        return ""
    tf = r["flops"] * r.get("n", 1) / secs / 1e12 if r["flops"] else 0
    gb = r["bytes"] * r.get("n", 1) / secs / 1e9 if r["bytes"] else 0
    return f"{tf:6.1f} TF/s {gb:6.0f} GB/s"


def aggregate(rows, key):
    agg = {}
    for r in rows:
        k = r[key]
        a = agg.setdefault(k, {"ps": 0, "flops": 0, "bytes": 0, "n": 1})
        a["ps"] += r["ps"]
        # totals across executions: per-op flops/bytes are per-execution
        a["flops"] += r["flops"] * r["n"]
        a["bytes"] += r["bytes"] * r["n"]
    return agg


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/samt_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    # optional 3rd arg: only ops whose hlo_category contains this
    # substring (e.g. "data formatting" to hunt layout copies)
    cat_filter = sys.argv[3] if len(sys.argv) > 3 else None
    rows = device_op_rows(load_xspace(trace_dir))
    if cat_filter:
        rows = [r for r in rows if cat_filter in r["cat"]]
    total_ps = sum(r["ps"] for r in rows)
    print(f"device total: {total_ps/1e9:.2f} ms over {len(rows)} ops")

    for key, title, n in (("cat", "HLO category", 99),
                          ("src", "source line", top_n)):
        agg = aggregate(rows, key)
        print(f"\n== by {title} ==")
        for k, a in sorted(agg.items(), key=lambda kv: -kv[1]["ps"])[:n]:
            print(f"{a['ps']/1e9:9.2f} ms  {100*a['ps']/total_ps:5.1f}%  "
                  f"{_rate(a):26s}  {k}")

    print(f"\n== top {top_n} ops ==")
    for r in sorted(rows, key=lambda r: -r["ps"])[:top_n]:
        rr = dict(r)
        print(f"{r['ps']/1e9:9.3f} ms  {100*r['ps']/total_ps:5.1f}%  "
              f"x{r['n']:<3d} {_rate(rr):26s} [{r['cat']:<14s}] "
              f"{r['name'][:48]:48s} {r['src']}")


if __name__ == "__main__":
    main()
