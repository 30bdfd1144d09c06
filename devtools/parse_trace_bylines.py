"""Per-SOURCE-LINE device-time attribution from a jax.profiler xplane dump.

Usage: python devtools/parse_trace_bylines.py /tmp/trace_r3b [n_steps]

Walks the TPU plane's flat "XLA Ops" line (no nesting — self-times sum to
busy time), groups event durations by the op metadata's `source` stat
(file:line of the python that traced the HLO), and prints ms per control
step for the top lines plus a by-category rollup.  This is the tool that
produced the round-3 gather hit list in PERF_NOTES.md.
"""

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main(logdir, n_steps=20):
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        stat_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        src_of = {}
        cat_of = {}
        name_of = {}
        for mid, m in plane.event_metadata.items():
            name_of[mid] = m.name.split(" = ")[0]
            for s in m.stats:
                nm = stat_meta.get(s.metadata_id)
                if nm == "source":
                    src_of[mid] = s.str_value
                elif nm == "hlo_category":
                    cat_of[mid] = s.str_value
        by_src = collections.Counter()
        by_cat = collections.Counter()
        ops_of_src = collections.defaultdict(collections.Counter)
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                # `while` events are containers: their duration includes
                # every body op, which appears separately on this same
                # line — counting both double-books the loop bodies
                if cat_of.get(ev.metadata_id) == "while":
                    continue
                dur = ev.duration_ps / 1e9 / n_steps  # ms per step
                src = src_of.get(ev.metadata_id, "<no source>")
                by_src[src] += dur
                by_cat[cat_of.get(ev.metadata_id, "?")] += dur
                ops_of_src[src][name_of.get(ev.metadata_id, "?")] += dur
                total += dur
        print(f"=== {plane.name}: {total:.1f} ms/step over {n_steps} steps ===")
        print("-- by hlo_category (ms/step) --")
        for cat, ms in by_cat.most_common(15):
            print(f"  {ms:9.2f}  {cat}")
        print("-- by source line (ms/step) --")
        for src, ms in by_src.most_common(40):
            top = ops_of_src[src].most_common(1)
            hint = top[0][0][:60] if top else ""
            print(f"  {ms:9.2f}  {src}  [{hint}]")
        break


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r3b",
        int(sys.argv[2]) if len(sys.argv) > 2 else 20,
    )
