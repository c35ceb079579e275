"""Count post-optimization HLO instructions (~= kernel dispatches) in the
physics step, attributed to source files via op metadata.

Each non-trivial instruction in the optimized entry computation is roughly
one device dispatch on the axon runtime (fusions count once). Loop bodies
dispatch per trip, so instructions inside while-loop called computations are
multiplied by an estimated trip count when --loops is given.
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import edyn_tpu as et
from edyn_tpu.utils import scenes
from edyn_tpu.simulation.stepper import physics_step_impl

N = int(os.environ.get("BENCH_BODIES", 10_000))


def main():
    builder, _ = scenes.mixed_pile(n_bodies=N)
    world = et.make_world(builder, et.Settings())
    lowered = jax.jit(physics_step_impl, static_argnames=("settings", "meta")).lower(
        world.state, world.settings, world.meta)
    compiled = lowered.compile()
    txt = compiled.as_text()

    # Parse computations: entry + called.  Count instructions per computation.
    comps = {}   # name -> list of (op, srcfile)
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^(?:ENTRY )?%?([\w\.\-]+) \(.*\) -> .* \{", line)
        if m and ("ENTRY" in line or line.startswith("%")):
            cur = m.group(1)
            comps[cur] = []
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        ls = line.strip()
        m = re.match(r"%?[\w\.\-]+ = [\w\[\]\{\}0-9, ]+ ([\w\-]+)\(", ls)
        if not m:
            continue
        op = m.group(1)
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast", "copy-done", "copy-start"):
            continue
        sm = re.search(r'op_name="([^"]*)"', ls)
        fm = re.search(r'source_file="([^"]*)"', ls)
        src = fm.group(1).split("/")[-1] if fm else "?"
        name = sm.group(1) if sm else "?"
        comps[cur].append((op, src, name))

    # entry computation: the top-level dispatch sequence
    entry = None
    for line in txt.splitlines():
        if line.startswith("ENTRY"):
            m = re.search(r"ENTRY %?([\w\.\-]+)", line)
            entry = m.group(1)
            break
    ent = comps.get(entry, [])
    print(f"total computations: {len(comps)}")
    print(f"entry instructions (~dispatches, loop bodies once): {len(ent)}")

    by_src = collections.Counter(src for _, src, _ in ent)
    print("\n-- entry by source file --")
    for s, c in by_src.most_common(25):
        print(f"  {c:5d}  {s}")

    by_op = collections.Counter(op for op, _, _ in ent)
    print("\n-- entry by op --")
    for s, c in by_op.most_common(25):
        print(f"  {c:5d}  {s}")

    # while loops: find their body computations and sizes
    print("\n-- while bodies (dispatched per trip) --")
    for line in txt.splitlines():
        if " while(" in line and "body=" in line:
            bm = re.search(r"body=%?([\w\.\-]+)", line)
            if bm and bm.group(1) in comps:
                body = comps[bm.group(1)]
                srcs = collections.Counter(s for _, s, _ in body).most_common(5)
                print(f"  body {bm.group(1)}: {len(body)} instrs  {srcs}")


if __name__ == "__main__":
    main()
