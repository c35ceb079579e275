"""Parity: the Pallas solver iteration kernels (dynamics/pallas_solver.py)
must match the jnp solver exactly (interpret mode on CPU).

Mirrors the reference's solver semantics tests by construction: the jnp path
is the tested-against-goldens implementation (SURVEY A.1/A.2); the Pallas
path must reproduce it."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edyn_tpu.dynamics import pallas_solver as ps
from edyn_tpu.dynamics import solver as solver_mod


def _random_rows(R=96, N=48, with_sr=True, seed=0):
    rng = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    u = lambda *s: jnp.asarray(rng.rand(*s).astype(np.float32))

    def unit(s0):
        v = rng.randn(s0, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return jnp.asarray(v.astype(np.float32))

    a = jnp.asarray(rng.randint(0, N, R).astype(np.int32))
    b = jnp.asarray(rng.randint(0, N, R).astype(np.int32))
    n = unit(R)
    t1 = unit(R)
    t2 = unit(R)

    def rd():
        return solver_mod.RowDir(JaA=f(R, 3), JaB=f(R, 3), tA=f(R, 3),
                                 tB=f(R, 3), eff_mass=u(R), rhs=f(R))

    valid = jnp.asarray(rng.rand(R) > 0.25)
    sr = dict(
        spin_friction=u(R) * 0.1, roll_friction=u(R) * 0.1,
        sA_n=f(R, 3), sB_n=f(R, 3), sA_t1=f(R, 3), sB_t1=f(R, 3),
        sA_t2=f(R, 3), sB_t2=f(R, 3),
        em_spin=u(R), em_roll1=u(R), em_roll2=u(R),
        rhs_spin=f(R), rhs_roll1=f(R), rhs_roll2=f(R),
        roll_t1=f(R, 3), roll_t2=f(R, 3),
    ) if with_sr else dict(
        spin_friction=None, roll_friction=None,
        sA_n=None, sB_n=None, sA_t1=None, sB_t1=None, sA_t2=None, sB_t2=None,
        em_spin=None, em_roll1=None, em_roll2=None,
        rhs_spin=None, rhs_roll1=None, rhs_roll2=None,
        roll_t1=None, roll_t2=None,
    )
    return solver_mod.ContactRows(
        valid=valid, a=a, b=b, ab=jnp.concatenate([a, b]),
        inv_mA=u(R), inv_mB=u(R), n=n, t1=t1, t2=t2,
        rn=rd(), r1=rd(), r2=rd(),
        friction=u(R), restitution=u(R),
        upper_n=jnp.where(jnp.asarray(rng.rand(R) > 0.5),
                          jnp.asarray(rng.rand(R).astype(np.float32) * 10),
                          ps.BIG),
        soft=jnp.asarray(rng.rand(R) > 0.8),
        row_slot=jnp.arange(R, dtype=jnp.int32),
        base_dist=f(R) * 0.01,
        rA=f(R, 3), rB=f(R, 3),
        dropped=jnp.zeros((), jnp.int32), count=jnp.int32(R),
        **sr)


@pytest.mark.parametrize("with_sr", [True, False])
def test_velocity_iteration_parity(with_sr):
    R, N = 96, 48
    rows = _random_rows(R, N, with_sr=with_sr)
    rng = np.random.RandomState(1)
    imp6 = jnp.asarray(rng.rand(R, 6).astype(np.float32))
    dvw = jnp.asarray(rng.randn(N, 6).astype(np.float32) * 0.1)

    # jnp reference path
    imp6_j, dvw_j = solver_mod.solve_contacts_once(rows, imp6, dvw)

    # pallas path (interpret)
    tbl, a_p, b_p, Rp = ps.pack_rows_t(rows)
    ab_p = jnp.concatenate([a_p, b_p])
    pad = Rp - R
    imp_t = (jnp.pad(imp6, ((0, pad), (0, 0))) if pad else imp6).T
    dvw_t = dvw.T
    g = dvw_t[:, ab_p]
    imp_t2, upd = ps.solve_iteration_pallas(tbl, imp_t, g, with_sr,
                                            interpret=True)
    dvw_p = dvw_t.at[:, ab_p].add(
        jnp.concatenate([upd[:6], upd[6:]], axis=1)).T
    imp6_p = imp_t2.T[:R]

    np.testing.assert_allclose(np.asarray(imp6_p), np.asarray(imp6_j),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dvw_p), np.asarray(dvw_j),
                               rtol=1e-5, atol=1e-5)


class _VelState:
    def __init__(self, N, seed=2):
        rng = np.random.RandomState(seed)
        self.capacity = N
        self.linvel = jnp.asarray(rng.randn(N, 3).astype(np.float32))
        self.angvel = jnp.asarray(rng.randn(N, 3).astype(np.float32))


def test_restitution_parity():
    R, N = 96, 48
    rows = _random_rows(R, N, with_sr=True, seed=3)
    # restitution pass needs approaching contacts: make rhs irrelevant (it
    # recomputes from velocities) and ensure some rows have restitution > 0
    st = _VelState(N)
    # few iterations: random (non-physical) rows amplify f32 rounding
    # exponentially over many passes; real-scene parity is covered by
    # test_end_to_end_step_parity
    lin_j, ang_j = solver_mod.solve_restitution(st, rows, 2, 2, 1 / 60)

    tbl, a_p, b_p, Rp = ps.pack_rows_t(rows)
    ab_p = jnp.concatenate([a_p, b_p])
    lin_p, ang_p = solver_mod.solve_restitution_pallas(
        st, rows, tbl, ab_p, 2, 2, interpret=True)

    np.testing.assert_allclose(np.asarray(lin_p), np.asarray(lin_j),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ang_p), np.asarray(ang_j),
                               rtol=1e-3, atol=1e-3)


def test_end_to_end_step_parity():
    """Full-step parity: a small box pile stepped with the jnp solver vs the
    Pallas solver path (interpret) must produce the same trajectory."""
    import edyn_tpu as et

    def build():
        b = et.WorldBuilder()
        b.make_rigidbody(et.RigidBodyDef(
            kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
            material=et.Material(friction=0.5)))
        rng = np.random.RandomState(7)
        for i in range(8):
            b.make_rigidbody(et.RigidBodyDef(
                mass=1.0, shape=et.BoxShape((0.5, 0.5, 0.5)),
                position=(rng.uniform(-1, 1), 0.6 + 1.2 * i,
                          rng.uniform(-1, 1)),
                material=et.Material(friction=0.6, restitution=0.3)))
        return b

    w1 = et.make_world(build(), et.Settings())
    w1.meta = dataclasses.replace(w1.meta, pallas_solver=False)
    w2 = et.make_world(build(), et.Settings())
    w2.meta = dataclasses.replace(w2.meta, pallas_solver=True)

    for _ in range(40):
        w1.step()
        w2.step()

    s1, s2 = w1.state, w2.state
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(s1.pos),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s2.linvel), np.asarray(s1.linvel),
                               rtol=1e-3, atol=5e-3)
