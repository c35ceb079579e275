"""Capture a jax.profiler device trace of the settled step and rank HLO ops
by self time — op-level ground truth for the kernel-count war (the decomposed
phase table can't see inside the fused step).

Usage: python scripts/tpu_op_profile.py [n_bodies] [settle] [trace_steps]
Writes the trace under /tmp/edyn_trace and prints the top ops.
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
SETTLE = int(sys.argv[2]) if len(sys.argv) > 2 else 150
TRACE_STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
OUT = "/tmp/edyn_trace"


def main():
    import jax
    import edyn_tpu as et
    from edyn_tpu.utils import scenes

    print("backend:", jax.default_backend(), flush=True)
    builder, _ = scenes.mixed_pile(n_bodies=N)
    world = et.make_world(builder, et.Settings())
    world.step_n(2)
    world.block_until_ready()
    done = 0
    while done < SETTLE:
        k = min(30, SETTLE - done)
        world.step_n(k)
        done += k
    world.block_until_ready()
    print("settled; tracing", flush=True)

    os.system(f"rm -rf {OUT}")
    with jax.profiler.trace(OUT):
        world.step_n(TRACE_STEPS)
        world.block_until_ready()

    paths = glob.glob(f"{OUT}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    if not paths:
        return

    parse(paths[0], TRACE_STEPS)


def parse(path, trace_steps):
    # Parse: rank XLA ops on the device plane by total self duration.
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    import collections
    tot = collections.Counter()
    cnt = collections.Counter()
    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e9  # ms
                cnt[name] += 1
        print(f"plane: {plane.name}, lines: {len(plane.lines)}", flush=True)
    total_ms = sum(tot.values())
    print(f"\ntotal device time: {total_ms:.1f} ms over {trace_steps} steps "
          f"({total_ms/trace_steps:.1f} ms/step), {sum(cnt.values())} events")
    print(f"{'ms/step':>9} {'count/step':>11}  op")
    for name, ms in tot.most_common(60):
        print(f"{ms/trace_steps:9.3f} {cnt[name]/trace_steps:11.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
