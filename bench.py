"""Benchmark: steps/sec on the 10k-body mixed-shape pile (BASELINE.md north
star). Prints ONE JSON line. Runs on whatever jax backend the env provides
(the driver runs it on a real TPU chip).

vs_baseline: the reference publishes no numbers and cannot be built here
(EnTT unavailable offline), so the denominator is the documented estimate in
BASELINE.md: ~20 steps/s for an edyn-class sequential-impulse engine on a
10k-body mixed pile, single thread, 8+3 iterations. Replace with a measured
number when the reference can be compiled.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_STEPS_PER_SEC = 20.0  # see BASELINE.md — estimated, not published
N_BODIES = int(os.environ.get("BENCH_BODIES", 10_000))
N_STEPS = int(os.environ.get("BENCH_STEPS", 30))


def main():
    import jax
    import edyn_tpu as et
    from edyn_tpu.utils import scenes

    builder, _ = scenes.mixed_pile(n_bodies=N_BODIES)
    world = et.make_world(builder, et.Settings())

    # compile + warmup (lets the pile make initial contact)
    world.step(2)
    world.block_until_ready()

    t0 = time.perf_counter()
    world.step(N_STEPS)
    world.block_until_ready()
    dt = time.perf_counter() - t0

    steps_per_sec = N_STEPS / dt
    print(json.dumps({
        "metric": f"steps/sec {N_BODIES}-body mixed-shape pile (8 vel + 3 pos iters)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
