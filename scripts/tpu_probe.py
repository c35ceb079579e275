"""Compile the 10k physics step on the live TPU backend, report the
optimized-HLO entry instruction count (~dispatches) and measured steps/s.

Run in a FRESH process (the axon relay enters a degraded per-dispatch mode
after large executables load; bench conditions reproduce that, so this is
representative of bench.py)."""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("BENCH_BODIES", 10_000))
STEPS = int(os.environ.get("BENCH_STEPS", 20))


def main():
    import jax
    import edyn_tpu as et
    from edyn_tpu.utils import scenes
    from edyn_tpu.simulation.stepper import physics_step_impl

    print("devices:", jax.devices())
    builder, _ = scenes.mixed_pile(n_bodies=N)
    world = et.make_world(builder, et.Settings())

    t0 = time.perf_counter()
    compiled = jax.jit(physics_step_impl,
                       static_argnames=("settings", "meta")).lower(
        world.state, world.settings, world.meta).compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s")
    try:
        txt = compiled.as_text()
        in_entry = False
        count = 0
        ops = {}
        for line in txt.splitlines():
            if line.startswith("ENTRY"):
                in_entry = True
                continue
            if in_entry and line.startswith("}"):
                break
            if in_entry:
                m = re.match(r"\s+%?[\w\.\-]+ = \S+ ([\w\-]+)\(", line)
                if m and m.group(1) not in (
                        "parameter", "constant", "tuple",
                        "get-tuple-element", "bitcast"):
                    count += 1
                    ops[m.group(1)] = ops.get(m.group(1), 0) + 1
        print(f"TPU entry instructions: {count}")
        print("by op:", dict(sorted(ops.items(), key=lambda kv: -kv[1])[:12]))
    except Exception as e:
        print("as_text failed:", type(e).__name__, str(e)[:200])

    world.step(2)
    world.block_until_ready()
    t0 = time.perf_counter()
    world.step(STEPS)
    world.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"steps/s ({N} bodies): {STEPS/dt:.2f}")


if __name__ == "__main__":
    main()
