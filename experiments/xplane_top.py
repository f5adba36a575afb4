#!/usr/bin/env python
"""Print the top XLA ops by total device time from a jax profiler trace.

Usage: python experiments/xplane_top.py /tmp/prof_dir [n_top]

Reads the .xplane.pb written by jax.profiler.start_trace/stop_trace and
aggregates the '/device:TPU:0' plane's 'XLA Ops' line by op name — the
op-level ground truth behind every hot-path decision in this repo
(ARCHITECTURE.md 'Performance notes').
"""
import glob
import sys
from collections import defaultdict


def main():
    root = sys.argv[1]
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 35
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {root}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    tpu = next(p for p in space.planes if "TPU" in p.name)
    emeta = tpu.event_metadata
    for line in tpu.lines:
        if line.name != "XLA Ops":
            continue
        agg, cnt = defaultdict(float), defaultdict(int)
        for e in line.events:
            name = emeta[e.metadata_id].name
            agg[name] += e.duration_ps / 1e12
            cnt[name] += 1
        total = sum(agg.values())
        # while ops nest their children; report them but mark
        print(f"total XLA-op time {total:.2f}s ({paths[-1]})")
        for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:n_top]:
            tag = " [outer]" if name.startswith("%while") else ""
            print(f"{t:8.3f}s {cnt[name]:6d}x  {name[:100]}{tag}")


if __name__ == "__main__":
    main()
