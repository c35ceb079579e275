"""Pin down the gather/scatter cost law on this runtime.

Questions:
1. standalone gather/scatter-add cost vs index width (50k..400k)
2. does cost change inside a fori_loop (the solve-loop shape)?
3. does an unrolled chain behave differently from a loop?
4. does target layout [N,6] vs [N,8] vs [8,N] matter?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, repeats=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(repeats):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / repeats


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    N = 10_000
    for W in (50_000, 100_000, 200_000, 400_000):
        v6 = jnp.asarray(rng.randn(N, 6), jnp.float32)
        ab = jnp.asarray(rng.randint(0, N, W).astype(np.int32))
        upd = jnp.asarray(rng.randn(W, 6), jnp.float32)
        g = jax.jit(lambda v, a: v[a])
        s = jax.jit(lambda v, a, u: v.at[a].add(u))
        gs = jax.jit(lambda v, a, u: v.at[a].add(v[a] * 1e-6 + u))
        print(f"W={W:7d}: gather {t(g, v6, ab)*1e3:7.3f}  scatter-add "
              f"{t(s, v6, ab, upd)*1e3:7.3f}  g+s {t(gs, v6, ab, upd)*1e3:7.3f} ms",
              flush=True)

    W = 100_000
    v6 = jnp.asarray(rng.randn(N, 6), jnp.float32)
    ab = jnp.asarray(rng.randint(0, N, W).astype(np.int32))
    upd = jnp.asarray(rng.randn(W, 6), jnp.float32)

    def body(i, v):
        gthr = v[ab]
        return v.at[ab].add(gthr * 1e-6 + upd)

    loop8 = jax.jit(lambda v: jax.lax.fori_loop(0, 8, body, v))
    unroll8 = jax.jit(lambda v: [v := body(0, v) for _ in range(8)][-1])
    tl = t(loop8, v6)
    tu = t(unroll8, v6)
    print(f"loop8:   {tl*1e3:7.2f} ms ({tl/8*1e3:6.3f}/trip)")
    print(f"unroll8: {tu*1e3:7.2f} ms ({tu/8*1e3:6.3f}/trip)")

    # wider row payload (the real iteration reads ~30 row arrays too)
    cols = jnp.asarray(rng.randn(W, 30), jnp.float32)

    def body2(i, v):
        gthr = v[ab]
        u = gthr * 1e-6 + cols[:, :6] + cols[:, 6:12] * gthr
        return v.at[ab].add(u)

    loop8b = jax.jit(lambda v: jax.lax.fori_loop(0, 8, body2, v))
    tb = t(loop8b, v6)
    print(f"loop8 + row payload: {tb*1e3:7.2f} ms ({tb/8*1e3:6.3f}/trip)")

    # layout variants
    v8 = jnp.asarray(rng.randn(N, 8), jnp.float32)
    upd8 = jnp.asarray(rng.randn(W, 8), jnp.float32)
    s8 = jax.jit(lambda v, a, u: v.at[a].add(u))
    print(f"[N,8] scatter-add: {t(s8, v8, ab, upd8)*1e3:7.3f} ms")
    vT = jnp.asarray(rng.randn(8, N), jnp.float32)
    updT = jnp.asarray(rng.randn(8, W), jnp.float32)
    sT = jax.jit(lambda v, a, u: v.at[:, a].add(u))
    gT = jax.jit(lambda v, a: v[:, a])
    print(f"[8,N] lane-gather: {t(gT, vT, ab)*1e3:7.3f} ms  "
          f"lane-scatter-add: {t(sT, vT, ab, updT)*1e3:7.3f} ms")

    # segment-sum alternative: rows pre-sorted by body, accumulate via
    # sorted-segment reduction (jax.ops.segment_sum) instead of scatter
    seg = jnp.sort(ab)
    ss = jax.jit(lambda u: jax.ops.segment_sum(u, seg, num_segments=N))
    print(f"segment_sum sorted [100k,6]->[N,6]: {t(ss, upd)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
