"""Aggregate HLO op self-times from a JAX xplane capture.

    python scripts/parse_xplane.py /tmp/oftpu_profile [top_n]

Groups device-plane events by op name (collapsing fusion suffixes) and
prints total duration per group, descending.
"""

import glob
import re
import sys
from collections import defaultdict


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oftpu_profile"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    pb = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)[0]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(pb, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        plane_total = 0.0
        for line in plane.lines:
            if "step" in line.name.lower():
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                base = re.sub(r"\.\d+$", "", name)
                totals[base] += dur
                counts[base] += 1
                plane_total += dur
        if not totals:
            continue
        print(f"== plane: {plane.name}  (sum {plane_total:.1f} ms over all "
              f"lines)")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"{ms:10.2f} ms {counts[name]:6d}x  {name[:110]}")


if __name__ == "__main__":
    main()
