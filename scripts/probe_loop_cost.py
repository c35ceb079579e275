"""Probe: what does a lax.fori_loop/while_loop TRIP cost on this runtime,
vs the same kernels unrolled? And does kernel cost scale with operand size
or operand COUNT?

If loop trips carry a fixed relay round-trip, the physics step's nested loops
(solve 8 trips, restitution 8x3, step_n outer) dominate the step time and the
fix is unrolling / fusing loop bodies, not shrinking the entry kernel count.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, repeats=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(repeats):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / repeats


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(10_000, 6), jnp.float32)

    # --- loop-trip cost: same op count, looped vs unrolled ---
    def body(i, v):
        return v * 1.000001 + 0.5

    for trips in (8, 32, 128):
        looped = jax.jit(lambda v, n=trips: jax.lax.fori_loop(0, n, body, v))
        unrolled = jax.jit(lambda v, n=trips: [v := body(0, v) for _ in range(n)][-1])
        tl = t(looped, x)
        tu = t(unrolled, x)
        print(f"trips={trips:4d}: fori {tl*1e3:8.2f} ms  unrolled {tu*1e3:8.2f} ms"
              f"  -> per-trip {tl/trips*1e3:6.3f} ms vs per-op {tu/trips*1e3:6.3f} ms",
              flush=True)

    # --- loop with a REAL body (gather+scatter, ~solver iteration shape) ---
    R = 100_000
    ab = jnp.asarray(rng.randint(0, 10_000, 2 * R).astype(np.int32))
    upd = jnp.asarray(rng.randn(2 * R, 6), jnp.float32)

    def solver_ish(i, v):
        g = v[ab]
        u = g * 1.0001 + upd
        return v.at[ab].add(u * 1e-6)

    for trips in (1, 8):
        f = jax.jit(lambda v, n=trips: jax.lax.fori_loop(0, n, solver_ish, v))
        tl = t(f, x)
        print(f"gather/scatter loop trips={trips}: {tl*1e3:8.2f} ms "
              f"({tl/trips*1e3:6.3f} ms/trip)", flush=True)

    # --- kernel cost vs operand size (fused elementwise over [R,40]) ---
    for R2 in (10_000, 100_000, 210_000):
        big = jnp.asarray(rng.randn(R2, 40), jnp.float32)
        f = jax.jit(lambda a: a * 1.0001 + jnp.tanh(a) * 0.1)
        print(f"one fused elementwise [R={R2:7d},40]: {t(f, big)*1e3:8.3f} ms",
              flush=True)

    # --- kernel cost vs operand COUNT (one fusion reading 40 arrays) ---
    cols = [jnp.asarray(rng.randn(210_000), jnp.float32) for _ in range(40)]

    def many(*cs):
        s = cs[0]
        for c in cs[1:]:
            s = s + c * 1.0001
        return s
    f = jax.jit(many)
    print(f"one fusion, 40 separate [210k] operands: {t(f, *cols)*1e3:8.3f} ms",
          flush=True)

    # --- chain of 100 kernels over [210k,40] (the real step's width) ---
    perms = [jnp.asarray(rng.permutation(210_000).astype(np.int32))
             for _ in range(4)]
    big = jnp.asarray(rng.randn(210_000, 40), jnp.float32)

    def chain(a):
        for i in range(100):
            a = a * 1.000001 + a[perms[i % 4]]
        return a
    f = jax.jit(chain)
    tl = t(f, big)
    print(f"100-kernel gather chain [210k,40]: {tl*1e3:8.2f} ms "
          f"({tl/100*1e3:6.3f} ms/kernel)", flush=True)

    # --- sort cost at pair-list width ---
    keys = jnp.asarray(rng.randint(0, 2**31, 140_000).astype(np.uint32))
    f = jax.jit(jnp.sort)
    print(f"sort [140k] u32: {t(f, keys)*1e3:8.3f} ms", flush=True)
    keys2 = jnp.asarray(rng.randint(0, 2**31, 16_000).astype(np.uint32))
    print(f"sort [16k] u32: {t(f, keys2)*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
