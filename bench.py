"""Benchmark: steps/sec on the mixed-shape pile (BASELINE.md north star).

Measures BOTH phases at multiple scales (falling = bodies airborne, cheap
manifolds; settled = dense resting pile, the harder steady state) and prints
one JSON line per config, then ONE final headline JSON line (the driver
contract) for the 10k settled pile with every other result embedded under
"configs".

vs_baseline: the reference publishes no numbers and cannot be built here
(EnTT unavailable offline), so the denominator is the documented estimate in
BASELINE.md: ~20 steps/s for an edyn-class sequential-impulse engine on a
10k-body mixed pile, single thread, 8+3 iterations.

Env knobs: BENCH_SIZES (default "1000,10000,16000"), BENCH_STEPS (timed
steps, default 60), BENCH_SETTLE (settle steps before the settled timing,
default 300), BENCH_PROFILE=dir (write a jax.profiler trace of the settled
10k phase).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_STEPS_PER_SEC = 20.0  # see BASELINE.md — estimated, not published
SIZES = [int(x) for x in os.environ.get(
    "BENCH_SIZES", "1000,10000,16000").split(",") if x]
N_STEPS = int(os.environ.get("BENCH_STEPS", 60))
SETTLE_STEPS = int(os.environ.get("BENCH_SETTLE", 300))
PROFILE_DIR = os.environ.get("BENCH_PROFILE")


def _time_steps(world, n):
    t0 = time.perf_counter()
    world.step_n(n)
    world.block_until_ready()
    return n / (time.perf_counter() - t0)


def bench_size(n_bodies: int):
    import edyn_tpu as et
    from edyn_tpu.utils import scenes

    builder, _ = scenes.mixed_pile(n_bodies=n_bodies)
    world = et.make_world(builder, et.Settings())

    # compile + initial contact
    world.step_n(2)
    world.block_until_ready()

    falling = _time_steps(world, N_STEPS)
    world.step_n(SETTLE_STEPS)
    world.block_until_ready()
    if PROFILE_DIR and n_bodies == 10_000:
        import jax
        with jax.profiler.trace(PROFILE_DIR):
            settled = _time_steps(world, N_STEPS)
    else:
        settled = _time_steps(world, N_STEPS)
    return {"bodies": n_bodies, "falling_steps_per_sec": round(falling, 2),
            "settled_steps_per_sec": round(settled, 2)}


def main():
    results = []
    for n in SIZES:
        r = bench_size(n)
        results.append(r)
        print(json.dumps({"config": r}), flush=True)

    head = next((r for r in results if r["bodies"] == 10_000), results[-1])
    v = head["settled_steps_per_sec"]
    print(json.dumps({
        "metric": f"steps/sec {head['bodies']}-body mixed-shape pile, "
                  f"SETTLED phase (8 vel + 3 pos iters)",
        "value": v,
        "unit": "steps/s",
        "vs_baseline": round(v / BASELINE_STEPS_PER_SEC, 2),
        "configs": results,
    }))


if __name__ == "__main__":
    main()
