"""On-TPU phase profile of the 10k settled pile (VERDICT r2 item 1: replace
the relay-ranked lever list in BASELINE.md with a scored-runtime phase table).

Runs the decomposed step (utils/profile.profile_step) on the settled pile,
prints a markdown-ready table + counters, and optionally writes a
jax.profiler trace (PROFILE_DIR env var).

Usage:  python scripts/tpu_phase_profile.py [n_bodies] [settle_steps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
SETTLE = int(sys.argv[2]) if len(sys.argv) > 2 else 300


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # the axon sitecustomize pins the platform AFTER env vars are read;
        # honoring the env var needs an explicit config update (otherwise a
        # down tunnel hangs the script in the plugin's retry loop)
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import edyn_tpu as et
    from edyn_tpu.utils import scenes
    from edyn_tpu.utils.profile import counters, profile_step

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    builder, _ = scenes.mixed_pile(n_bodies=N)
    world = et.make_world(builder, et.Settings())

    t0 = time.perf_counter()
    world.step_n(2)
    world.block_until_ready()
    print(f"compile+2 steps: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    # chunked calls: the axon relay kills a single long-running execution
    # (same workaround as bench.py CALL_CHUNK)
    done = 0
    while done < SETTLE:
        k = min(30, SETTLE - done)
        world.step_n(k)
        done += k
    world.block_until_ready()
    settle_rate = SETTLE / (time.perf_counter() - t0)
    print(f"settle {SETTLE} steps: {settle_rate:.1f} steps/s (fused step_n)")

    prof_dir = os.environ.get("PROFILE_DIR")
    if prof_dir:
        import jax.profiler
        with jax.profiler.trace(prof_dir):
            world.step_n(30)
            world.block_until_ready()
        print(f"trace written to {prof_dir}")

    timers = profile_step(world, repeats=5)
    cnt = counters(world.state)
    print("\n| phase | ms |")
    print("|---|---|")
    for k, v in sorted(timers.items(), key=lambda kv: -kv[1]):
        print(f"| {k} | {v:.2f} |")
    print()
    print(json.dumps({"bodies": N, "settled_steps_per_sec": round(settle_rate, 2),
                      "phases_ms": {k: round(v, 3) for k, v in timers.items()},
                      "counters": dataclasses_dict(cnt)}))


def dataclasses_dict(x):
    import dataclasses
    return dataclasses.asdict(x)


if __name__ == "__main__":
    main()
