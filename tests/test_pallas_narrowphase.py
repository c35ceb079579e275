"""Parity: the Pallas unified-bucket mega-kernel must match the jnp
reference kernel (support_sat.collide_support) point for point."""
import numpy as np
import jax.numpy as jnp
import pytest

import edyn_tpu as et
from edyn_tpu.collision.kernels.pallas_unified import (
    BLK, collide_support_pallas, pack_side_table_t)
from edyn_tpu.collision.kernels.support import pack_side_table, side_from_packed
from edyn_tpu.collision.kernels.support_sat import collide_support

THRESH = 0.02


def _random_world(seed, n=24):
    rng = np.random.RandomState(seed)
    b = et.WorldBuilder()
    shapes = [
        lambda: et.SphereShape(0.2 + 0.3 * rng.rand()),
        lambda: et.BoxShape(0.15 + 0.3 * rng.rand(3)),
        lambda: et.CapsuleShape(0.1 + 0.2 * rng.rand(), 0.2 + 0.3 * rng.rand()),
        lambda: et.CylinderShape(0.1 + 0.2 * rng.rand(), 0.2 + 0.3 * rng.rand()),
    ]
    for i in range(n):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=shapes[i % 4](),
            position=tuple(rng.randn(3) * 0.5),
            orientation=tuple(q)))
    return et.make_world(b, et.Settings())


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_jnp_reference(seed):
    w = _random_world(seed)
    st = w.state
    N = st.capacity
    rng = np.random.RandomState(100 + seed)
    K = BLK  # one block
    ka = jnp.asarray(rng.randint(0, N, size=K), jnp.int32)
    kb = jnp.asarray(rng.randint(0, N, size=K), jnp.int32)
    kb = jnp.where(kb == ka, (kb + 1) % N, kb)

    packed, dims = pack_side_table(st)
    A = side_from_packed(packed[ka], dims)
    B = side_from_packed(packed[kb], dims)
    ref = collide_support(A, B, THRESH, rim_axes=True)

    packed_t, dims_t = pack_side_table_t(st)
    got = collide_support_pallas(packed_t[:, ka], packed_t[:, kb], dims_t,
                                 THRESH, rim_axes=True, interpret=True)
    got = np.asarray(got)

    pv_ref = np.asarray(ref.point_valid)
    pv_got = got[..., 11] > 0.5
    d_ref = np.where(pv_ref, np.asarray(ref.distance), 1e9)
    d_got = np.where(pv_got, got[..., 10], 1e9)

    # per-pair comparison, order-insensitive (points 1..3 are spread/area
    # picks whose selection order legitimately differs under exact depth
    # ties in deep-penetration configurations):
    has_ref = pv_ref.any(-1)
    has_got = pv_got.any(-1)
    assert (has_ref != has_got).mean() < 0.01, "contact existence mismatch"
    both = has_ref & has_got
    # deepest point must agree exactly-ish
    np.testing.assert_allclose(d_got.min(-1)[both], d_ref.min(-1)[both],
                               atol=5e-4)
    # deepest-point normal must agree
    i_ref = d_ref.argmin(-1)
    i_got = d_got.argmin(-1)
    n_ref = np.take_along_axis(np.asarray(ref.normal),
                               i_ref[:, None, None].repeat(3, -1), 1)[:, 0]
    n_got = np.take_along_axis(got[..., 6:9],
                               i_got[:, None, None].repeat(3, -1), 1)[:, 0]
    np.testing.assert_allclose(n_got[both], n_ref[both], atol=2e-3)
    # valid counts within 1 for shallow (physical) contacts
    shallow = both & (d_ref.min(-1) > -0.05)
    dcount = np.abs(pv_ref.sum(-1) - pv_got.sum(-1))
    assert (dcount[shallow] <= 1).mean() > 0.97, dcount[shallow]


def test_pallas_world_step_matches_jnp(tmp_path):
    """Step the same pile with both narrowphase paths: trajectories match."""
    import dataclasses
    w1 = _random_world(7, n=32)
    w2 = _random_world(7, n=32)
    w2.meta = dataclasses.replace(w2.meta, pallas_narrowphase=False)
    # interpret-mode pallas on CPU
    import edyn_tpu.collision.kernels.pallas_unified as pu
    import edyn_tpu.collision.narrowphase as np_mod
    orig = pu.collide_support_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    pu.collide_support_pallas = interp
    try:
        w1.meta = dataclasses.replace(w1.meta, pallas_narrowphase=True)
        w1.step(8)
        w2.step(8)
    finally:
        pu.collide_support_pallas = orig
    p1 = np.asarray(w1.state.pos)
    p2 = np.asarray(w2.state.pos)
    np.testing.assert_allclose(p1, p2, atol=5e-3)
