"""Sharded-step scaling measurement (VERDICT r1 #9).

Measures steps/s of the SAME 4k-body mixed pile on a 1-device vs 8-device
virtual CPU mesh (xla_force_host_platform_device_count) and records the
numbers in MULTICHIP-style JSON (SHARDING_SCALE.json). Virtual devices share
one physical CPU, so ideal scaling is ~1.0x wall-clock (the win is that the
program partitions); the interesting signals are (a) it runs partitioned at
all, (b) the collective mix GSPMD inserted, (c) comm volume per step.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import edyn_tpu as et
from edyn_tpu.parallel.sharding import make_mesh, make_sharded_step
from edyn_tpu.utils import scenes

N_BODIES = int(os.environ.get("SCALE_BODIES", 4000))
N_STEPS = int(os.environ.get("SCALE_STEPS", 10))


def build():
    # capacity rounded to a multiple of 8 so every table shards evenly
    builder, _ = scenes.mixed_pile(n_bodies=N_BODIES)
    cap = -(-(N_BODIES + 8) // 8) * 8
    return et.make_world(builder, et.Settings(), capacity=cap)


def measure(n_dev: int):
    w = build()
    mesh = make_mesh(jax.devices()[:n_dev])
    step, dstate = make_sharded_step(mesh, w.state, w.settings, w.meta)
    dstate = step(dstate)  # compile + warm
    jax.block_until_ready(dstate)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        dstate = step(dstate)
    jax.block_until_ready(dstate)
    dt = time.perf_counter() - t0
    # collective mix from the optimized HLO
    txt = step.lower(dstate).compile().as_text()
    colls = {}
    for op in ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all"):
        n = txt.count(f" {op}(") + txt.count(f" {op}-start(")
        if n:
            colls[op] = n
    return N_STEPS / dt, colls, dstate


def main():
    sps1, colls1, st1 = measure(1)
    sps8, colls8, st8 = measure(8)
    # correctness: both end states match
    p1 = np.asarray(st1.pos)
    p8 = np.asarray(st8.pos)
    max_dev = float(np.abs(p1 - p8).max())
    out = {
        "bodies": N_BODIES,
        "steps": N_STEPS,
        "steps_per_sec_1dev": round(sps1, 3),
        "steps_per_sec_8dev": round(sps8, 3),
        "ratio_8v1": round(sps8 / sps1, 3),
        "collectives_8dev": colls8,
        "max_pos_deviation_8v1": max_dev,
        "note": "8 virtual devices share one physical CPU; ratio ~1.0 means "
                "partitioning adds no overhead, >1 means better cache "
                "behavior, <1 is collective overhead",
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SHARDING_SCALE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
