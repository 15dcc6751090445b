"""Offline analysis of a jax.profiler XSpace trace (no TPU needed).

Summarizes the device plane into per-step costs: synchronous op
categories (async copy-start/async-start durations overlap compute and
would double-count wall time, so they are reported separately), plus the
top synchronous fusions with shapes. Feeds the PERF.md tables.

Usage: python scripts/analyze_xplane.py /tmp/rn50_trace [steps]
"""

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASYNC = ("copy-start", "async-start", "copy-done", "async-done")


def load_space(trace_dir):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def categorize(name):
    n = name.lower()
    if n.startswith(ASYNC):
        return "async"
    if "convolution" in n or n.startswith("%conv") or "conv2d" in n:
        return "convolution"
    if "custom-call" in n or "pallas" in n:
        return "custom-call"
    if "select-and-scatter" in n:
        return "maxpool-bwd"
    if "reduce" in n:
        return "reduce(BN stats &c)"
    if "fusion" in n:
        return "fusion(elementwise)"
    if any(k in n for k in ("copy", "transpose", "bitcast", "pad", "slice",
                            "formatting", "dynamic-update")):
        return "data-movement"
    return "other"


def main():
    trace_dir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    space = load_space(trace_dir)
    for plane in space.planes:
        if "TPU" not in plane.name or "Chip" in plane.name:
            continue
        meta = plane.event_metadata
        sync_cat = defaultdict(float)
        async_cat = defaultdict(float)
        per_op = defaultdict(float)
        t_lo, t_hi = None, 0
        for line in plane.lines:
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else str(ev.metadata_id)
                dur = ev.duration_ps / 1e9  # ms
                nl = name.lstrip("%").lower()
                cat = categorize(nl)
                if cat == "async":
                    async_cat[nl.split(".")[0]] += dur
                    continue
                sync_cat[cat] += dur
                per_op[name] += dur
                t0 = ev.offset_ps
                t_lo = t0 if t_lo is None else min(t_lo, t0)
                t_hi = max(t_hi, t0 + ev.duration_ps)
        wall = (t_hi - (t_lo or 0)) / 1e9
        print(f"== {plane.name}: trace wall {wall:.1f} ms over {steps} steps "
              f"({wall / steps:.2f} ms/step)")
        print("-- synchronous device time, ms/step:")
        total = 0.0
        for cat, ms in sorted(sync_cat.items(), key=lambda kv: -kv[1]):
            print(f"  {ms / steps:8.2f}  {cat}")
            total += ms
        print(f"  {total / steps:8.2f}  TOTAL sync")
        print("-- async (overlapped; not wall time), ms/step:")
        for cat, ms in sorted(async_cat.items(), key=lambda kv: -kv[1]):
            print(f"  {ms / steps:8.2f}  {cat}")
        print("-- top 30 sync ops, ms/step:")
        for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {ms / steps:8.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
