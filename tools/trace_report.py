"""Parse a jax.profiler xplane trace into a per-op time table.

  python tools/trace_report.py /tmp/munit_trace [top_n]

Aggregates XLA op durations on the device plane(s), grouping by fusion/op
name prefix, so the train step's time budget is attributable without a
tensorboard UI (none in this environment).
"""

import glob
import os
import sys
from collections import defaultdict


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/munit_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        sys.exit(f"no .xplane.pb under {outdir}")
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if "TPU" not in plane.name and "/device:" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            totals = defaultdict(float)
            counts = defaultdict(int)
            total_ns = 0.0
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e3  # ns
                    totals[name] += dur
                    counts[name] += 1
                    total_ns += dur
            if not totals:
                continue
            print(f"\n=== {plane.name} (total {total_ns / 1e6:.2f} ms over "
                  f"{sum(counts.values())} events) ===")
            for name, ns in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"{ns / 1e6:9.3f} ms {counts[name]:5d}x  {name[:110]}")


if __name__ == "__main__":
    main()
