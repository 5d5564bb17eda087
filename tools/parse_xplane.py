"""Parse a jax.profiler xplane.pb and print top device ops by total self time.

Standalone (CPU) — works around the broken tensorboard_plugin_profile wrapper
in this image by reading the XSpace proto directly.
Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/parse_xplane.py <trace_dir> [top_n]
"""
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main(trace_dir: str, top_n: int = 30):
    pbs = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    assert pbs, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = {m_id: m for m_id, m in plane.event_metadata.items()}
        stat_meta = {m_id: m.name for m_id, m in plane.stat_metadata.items()}
        tot = collections.Counter()
        cnt = collections.Counter()
        info = {}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = (m.display_name or m.name) if m else str(ev.metadata_id)
                if name.startswith(("while", "jit_")):
                    continue
                tot[name] += ev.duration_ps / 1e6  # -> us
                cnt[name] += 1
                if name not in info and m is not None:
                    stats = {}
                    for st in m.stats:
                        k = stat_meta.get(st.metadata_id, "")
                        v = (st.str_value or st.ref_value or st.int64_value
                             or st.double_value)
                        stats[k] = v
                    info[name] = stats
        if not tot:
            continue
        print(f"== plane: {plane.name}: {sum(tot.values()):.0f} us leaf total")
        for name, us in tot.most_common(top_n):
            st = info.get(name, {})
            extra = str(st.get("hlo_op", st))[:160]
            print(f"{us:10.1f} us  x{cnt[name]:<5d} {name[:60]}\n"
                  f"             {extra}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
