"""Measure the axon-relay dispatch pathology: per-kernel cost vs program size.

Builds chains of n unfusable kernels (gather + add, alternating permutations)
over 10k-body-sized buffers and times per-kernel cost for several n. If
per-kernel cost grows with n (program size), kernel-count reduction has
superlinear payoff; the knee tells us the executable-size budget.

Also: after loading the LARGEST program, re-times the smallest to test the
"loaded big executable poisons every dispatch" claim in BASELINE.md.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_chain(n, perms):
    p = len(perms)

    def f(x):
        for i in range(n):
            x = x * 1.000001 + x[perms[i % p]]
        return x
    return jax.jit(f)


def time_call(f, x, repeats=5):
    r = f(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(repeats):
        r = f(x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / repeats


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)
    N = 10_000
    x = jnp.asarray(rng.randn(N, 6), jnp.float32)
    # 8 distinct permutations so gathers can't CSE
    perms = [jnp.asarray(rng.permutation(N).astype(np.int32)) for _ in range(8)]

    fns = {}
    small = make_chain(10, perms)
    t_small_fresh = time_call(small, x)
    print(f"n=  10 fresh-process: {t_small_fresh*1e3:8.2f} ms total, "
          f"{t_small_fresh/10*1e3:6.3f} ms/kernel")

    for n in (50, 100, 200, 400, 800, 1600):
        f = make_chain(n, perms)
        fns[n] = f
        t = time_call(f, x)
        print(f"n={n:4d}: {t*1e3:8.2f} ms total, {t/n*1e3:6.3f} ms/kernel",
              flush=True)

    # big executable now loaded; re-time the small one
    t_small_after = time_call(small, x)
    print(f"n=  10 after big load: {t_small_after*1e3:8.2f} ms total, "
          f"{t_small_after/10*1e3:6.3f} ms/kernel")


if __name__ == "__main__":
    main()
