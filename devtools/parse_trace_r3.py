"""Aggregate device-time per XLA op from a jax.profiler xplane dump.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python parse_trace_r3.py /tmp/trace_r3

Walks the TPU device plane(s), sums event durations by (a) op category
(fusion/copy/transpose/...) and (b) top-N individual ops, and reports gaps
(wall span minus busy time) — the scheduling-pathology signature.
"""

import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(logdir):
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    return xs


def main(logdir):
    xs = load(logdir)
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        print(f"=== plane: {plane.name} ===")
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        by_name = collections.Counter()
        by_cat = collections.Counter()
        spans = []
        for line in plane.lines:
            if "Step" in line.name or "step" in line.name:
                pass
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                by_name[name] += dur
                cat = name.split(".")[0].split("(")[0]
                # strip trailing digits: fusion.123 -> fusion
                cat = re.sub(r"[\d_]+$", "", cat)
                by_cat[cat] += dur
                spans.append((ev.offset_ps, ev.offset_ps + ev.duration_ps))
        if not spans:
            continue
        busy = sum(b - a for a, b in spans) / 1e9
        lo = min(a for a, _ in spans)
        hi = max(b for _, b in spans)
        print(f"lines={len(plane.lines)} events={len(spans)} "
              f"busy={busy:.1f} ms  wall-span={(hi-lo)/1e9:.1f} ms")
        print("-- by category (ms over traced window) --")
        for k, v in by_cat.most_common(25):
            print(f"  {v:9.2f}  {k}")
        print("-- top ops --")
        for k, v in by_name.most_common(40):
            print(f"  {v:9.2f}  {k}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r3")
