"""Relay-friendly on-TPU profile: like tpu_phase_profile.py but every device
call is bounded (<= CHUNK steps) so the axon relay's per-call limit is never
hit (a single step_n(300) at 10k bodies dies with UNAVAILABLE on the relay;
the driver's runtime has no such limit).

Usage: python scripts/tpu_profile_chunked.py [n_bodies] [settle_steps] [chunk]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
SETTLE = int(sys.argv[2]) if len(sys.argv) > 2 else 300
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 30


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import edyn_tpu as et
    from edyn_tpu.utils import scenes
    from edyn_tpu.utils.profile import counters, profile_step

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    builder, _ = scenes.mixed_pile(n_bodies=N)
    world = et.make_world(builder, et.Settings())

    t0 = time.perf_counter()
    world.step_n(2)
    world.block_until_ready()
    print(f"compile+2 steps: {time.perf_counter()-t0:.1f}s", flush=True)

    # falling rate (bounded calls)
    t0 = time.perf_counter()
    world.step_n(CHUNK)
    world.block_until_ready()
    print(f"falling: {CHUNK/(time.perf_counter()-t0):.2f} steps/s", flush=True)

    # settle counter starts at 0: the compile + falling steps are extra, so
    # SETTLE settle steps run after the falling measurement (comparable to
    # tpu_phase_profile.py for the same argument)
    done = 0
    while done < SETTLE:
        n = min(CHUNK, SETTLE - done)
        t0 = time.perf_counter()
        world.step_n(n)
        world.block_until_ready()
        done += n
        print(f"  settle {done}/{SETTLE}: {n/(time.perf_counter()-t0):.2f} steps/s",
              flush=True)

    t0 = time.perf_counter()
    world.step_n(CHUNK)
    world.block_until_ready()
    settled = CHUNK / (time.perf_counter() - t0)
    print(f"settled: {settled:.2f} steps/s", flush=True)

    timers = profile_step(world, repeats=5)
    cnt = counters(world.state)
    print("\n| phase | ms |", flush=True)
    print("|---|---|", flush=True)
    # profile_step values are already in milliseconds (utils/profile.py)
    for k, v in sorted(timers.items(), key=lambda kv: -kv[1]):
        print(f"| {k} | {v:.2f} |", flush=True)
    import dataclasses
    print(json.dumps({"counters": {k: int(v) for k, v in
                                   dataclasses.asdict(cnt).items()},
                      "settled_steps_per_sec": round(settled, 2)}), flush=True)


if __name__ == "__main__":
    main()
