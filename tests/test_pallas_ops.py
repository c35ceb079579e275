"""Pallas kernel tests (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

import edyn_tpu as et
from edyn_tpu.ops.overlap_count import count_overlaps, suggest_max_pairs


def test_overlap_count_matches_reference():
    rng = np.random.default_rng(0)
    N = 300
    centers = rng.uniform(-5, 5, (N, 3)).astype(np.float32)
    half = rng.uniform(0.1, 0.8, (N, 1)).astype(np.float32)
    amin = jnp.asarray(centers - half)
    amax = jnp.asarray(centers + half)
    valid = jnp.asarray(rng.uniform(size=N) > 0.1)

    got = int(count_overlaps(amin, amax, valid, interpret=True))

    am, ax, v = np.asarray(amin), np.asarray(amax), np.asarray(valid)
    expect = 0
    for i in range(N):
        for j in range(i + 1, N):
            if v[i] and v[j] and (am[i] <= ax[j]).all() and (ax[i] >= am[j]).all():
                expect += 1
    assert got == expect, (got, expect)


def test_suggest_max_pairs():
    from edyn_tpu.utils.scenes import mixed_pile
    b, ids = mixed_pile(n_bodies=40)
    w = et.make_world(b)
    w.step(60)
    n = suggest_max_pairs(w.state, interpret=True)
    assert 256 <= n <= w.meta.max_pairs * 4
