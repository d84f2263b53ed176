"""Parse a jax.profiler xplane trace into per-category / per-op device
occupancy (ms per traced step).

The axon tunnel supports full device tracing; tensorboard's converter in
this image lacks xspace_to_tools_data, so this parses the xplane proto
directly (tensorflow.tsl.profiler.protobuf). Usage:

  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/trace_ops.py /tmp/jaxtrace [n_steps] [--top N] [--cat C]

Durations use device_duration_ps (true TensorCore occupancy); the span
duration of async ops (copy-start etc.) measures latency across the
overlap window, not occupancy, and is reported separately.
"""
import glob
import sys
from collections import defaultdict


def load(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    return [p for p in xs.planes if p.name == "/device:TPU:0"][0]


def main():
    trace_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 3
    top = 20
    cat_filter = None
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    if "--cat" in sys.argv:
        cat_filter = sys.argv[sys.argv.index("--cat") + 1]

    tpu = load(trace_dir)
    sm = {k: v.name for k, v in tpu.stat_metadata.items()}
    dur_id = [k for k, v in sm.items() if v == "device_duration_ps"][0]
    info = {}
    for mid, md in tpu.event_metadata.items():
        cat, shape = "?", ""
        for st in md.stats:
            nme = sm.get(st.metadata_id)
            if nme == "hlo_category":
                cat = st.str_value
            elif nme == "shape_with_layout":
                shape = st.str_value
        info[mid] = (md.name.split(" = ")[0], cat, shape)

    line = [l for l in tpu.lines if l.name == "XLA Ops"][0]
    bycat = defaultdict(float)
    byop = defaultdict(float)
    shapes = {}
    for e in line.events:
        name, cat, shape = info[e.metadata_id]
        d = 0
        for st in e.stats:
            if st.metadata_id == dur_id:
                d = st.uint64_value
        d = d / 1e9 / n
        bycat[cat] += d
        if cat_filter is None or cat == cat_filter:
            byop[name] += d
            shapes[name] = (cat, shape)
    print(f"device occupancy total {sum(bycat.values()):.1f} ms/step "
          f"({n} steps)")
    for c, t in sorted(bycat.items(), key=lambda kv: -kv[1]):
        if t > 0.05:
            print(f"  {t:8.2f} ms  {c}")
    print("top ops:" + (f" [{cat_filter}]" if cat_filter else ""))
    for nme, t in sorted(byop.items(), key=lambda kv: -kv[1])[:top]:
        c, shp = shapes[nme]
        print(f"  {t:7.3f} ms {c[:18]:18s} {nme[:28]:28s} {shp[:60]}")


if __name__ == "__main__":
    main()
