"""Attribute traced device time to source files/phases.

Joins the xplane trace (XLA Ops leaf events) with the compiled HLO's
op metadata (op_name scope + source_file) so each fusion's device time lands
on the phase that generated it. This is the kernel-war scoreboard.

Usage: python scripts/tpu_attr_profile.py <xplane.pb> [n_bodies]
(n_bodies must match the traced world so the compiled HLO names line up)
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

CONTAINERS = ("while", "conditional", "call", "fusion")  # fusion NOT a container


def hlo_meta_map():
    import jax
    import jax.numpy as jnp
    import edyn_tpu as et
    from edyn_tpu.utils import scenes
    from edyn_tpu.simulation.stepper import _step_n_impl

    builder, _ = scenes.mixed_pile(n_bodies=N)
    world = et.make_world(builder, et.Settings())
    lowered = jax.jit(_step_n_impl, static_argnames=("settings", "meta")).lower(
        world.state, jnp.int32(3), world.settings, world.meta)
    txt = lowered.compile().as_text()
    name2src = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w\.\-]+) = ", line)
        if not m:
            continue
        nm = m.group(1)
        fm = re.search(r'source_file="([^"]*)"', line)
        om = re.search(r'op_name="([^"]*)"', line)
        src = fm.group(1).split("/")[-1] if fm else None
        op = om.group(1) if om else None
        if src or op:
            name2src[nm] = (src, op)
    return name2src


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(PATH, "rb") as f:
        space.ParseFromString(f.read())

    name2src = hlo_meta_map()
    print(f"hlo metadata entries: {len(name2src)}", flush=True)

    per_src = collections.Counter()
    per_op = collections.Counter()
    per_opn = collections.Counter()
    cnt_op = collections.Counter()
    total = 0.0
    nsteps = None
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name == "XLA Modules":
                nsteps = 3 * len(line.events)  # step_n(3) per module exec
                mod_ms = sum(ev.duration_ps for ev in line.events) / 1e9
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                full = ev_meta.get(ev.metadata_id, "?")
                m = re.match(r"%?([\w\.\-]+) =", full)
                nm = m.group(1) if m else full
                base = nm.split(".")[0]
                if base in ("while", "conditional", "call"):
                    continue  # containers nest their children
                if base.endswith("-start"):
                    continue  # async in-flight window, overlaps compute
                ms = ev.duration_ps / 1e9
                total += ms
                src, opn = name2src.get(nm, (None, None))
                per_src[src or "?"] += ms
                per_op[base] += ms
                cnt_op[base] += 1
                if opn:
                    # collapse scopes: keep the last two path segments
                    segs = opn.split("/")
                    per_opn["/".join(segs[-2:])] += ms

    print(f"modules: {mod_ms:.1f} ms over {nsteps} steps "
          f"({mod_ms/nsteps:.1f} ms/step)")
    print(f"leaf op time: {total:.1f} ms total, {total/nsteps:.2f} ms/step\n")
    print("-- by source file (ms/step) --")
    for s, msv in per_src.most_common(25):
        print(f"  {msv/nsteps:8.2f}  {s}")
    print("\n-- by op type (ms/step, count/step) --")
    for s, msv in per_op.most_common(20):
        print(f"  {msv/nsteps:8.2f} {cnt_op[s]/nsteps:8.1f}  {s}")
    print("\n-- by op_name scope tail (ms/step) --")
    for s, msv in per_opn.most_common(40):
        print(f"  {msv/nsteps:8.2f}  {s[:110]}")


if __name__ == "__main__":
    main()
