#!/usr/bin/env python
"""Summarize a jax.profiler trace: top XLA ops by self time.

Usage:
  python scripts/xplane_top_ops.py <trace_dir> [top_n]

Reads the newest `*.xplane.pb` under <trace_dir>/plugins/profile/*/ and
prints one line per op (aggregated over occurrences) from the TPU device
plane's "XLA Ops" line: total self-ms, count, and the op name.  This is
the tool behind PERF.md's "where the time goes" tables (PERF.md cites the
xplane proto directly; earlier rounds used an ad-hoc script — now checked
in so the numbers are reproducible).

Parsing uses tensorflow's bundled xplane proto schema; tensorflow is a
host-side dev dependency only (the framework itself never imports it).
"""
from __future__ import annotations

import collections
import glob
import os
import sys


def find_xplane(trace_dir: str) -> str:
    pats = [os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb"),
            os.path.join(trace_dir, "**", "*.xplane.pb")]
    for pat in pats:
        hits = sorted(glob.glob(pat, recursive=True), key=os.path.getmtime)
        if hits:
            return hits[-1]
    raise FileNotFoundError(f"no *.xplane.pb under {trace_dir!r}")


def load_xspace(path: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # older TF layouts
        from tensorflow.core.profiler.protobuf import xplane_pb2
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def op_table(xspace, line_name="XLA Ops"):
    """{op_name: (total_self_ns, count)} from the device planes' events on
    the `line_name` line ("XLA Ops" self-time by default; pass e.g.
    "XLA Modules" or "Steps" to aggregate a different plane line)."""
    out = collections.defaultdict(lambda: [0, 0])
    planes = [p for p in xspace.planes
              if "TPU" in p.name or "/device:" in p.name.lower()
              or p.name.startswith("/device")]
    if not planes:  # fall back: any plane with a matching line
        planes = list(xspace.planes)
    for plane in planes:
        ev_names = dict(plane.event_metadata.items())
        for line in plane.lines:
            if line.name != line_name:
                continue
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else f"op_{ev.metadata_id}"
                out[name][0] += ev.duration_ps // 1000   # ps -> ns
                out[name][1] += 1
    return out


def main(argv):
    if len(argv) < 2:
        print("usage: python scripts/xplane_top_ops.py <trace_dir> [top_n]",
              file=sys.stderr)
        return 2
    trace_dir = argv[1]
    top_n = int(argv[2]) if len(argv) > 2 else 25
    path = find_xplane(trace_dir)
    table = op_table(load_xspace(path))
    if not table:
        print("no XLA Ops events found (CPU-only trace?)", file=sys.stderr)
        return 1
    total_ms = sum(ns for ns, _ in table.values()) / 1e6
    print(f"# {path}")
    print(f"# total XLA-op self time: {total_ms:.2f} ms")
    print(f"{'self_ms':>10} {'pct':>6} {'count':>7}  op")
    rows = sorted(table.items(), key=lambda kv: -kv[1][0])
    for name, (ns, cnt) in rows[:top_n]:
        ms = ns / 1e6
        print(f"{ms:10.3f} {100 * ms / total_ms:5.1f}% {cnt:7d}  {name}")
    rest = sum(ns for _, (ns, c) in rows[top_n:]) / 1e6
    if rest:
        print(f"{rest:10.3f} {100 * rest / total_ms:5.1f}% {'':7}  "
              f"(everything else, {len(rows) - top_n} ops)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
