"""Restitution shock propagation (Newton's cradle): the signature behavior of
the reference's restitution pre-pass, which graph-traverses from the fastest
body and applies impulses immediately so momentum crosses a touching chain in
ONE step (reference: src/edyn/dynamics/restitution_solver.cpp:86-120; SURVEY
A.5 — reformulated here as island-BFS wave passes with early exit)."""
import numpy as np

import edyn_tpu as et

R = 0.5


def _cradle(n_balls=4, speed=4.0, restitution=1.0):
    """A striker moving at ``speed`` toward a touching row of balls floating
    in zero gravity (isolates the restitution pass from stacking)."""
    b = et.WorldBuilder(gravity=(0.0, 0.0, 0.0))
    ids = []
    striker = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(R), position=(-2.0 * R - 0.3, 0, 0),
        linvel=(speed, 0, 0), sleeping_disabled=True,
        material=et.Material(restitution=restitution, friction=0.0)))
    for i in range(n_balls):
        ids.append(b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.SphereShape(R),
            position=(i * 2.0 * R, 0.0, 0.0), sleeping_disabled=True,
            material=et.Material(restitution=restitution, friction=0.0))))
    w = et.make_world(b, et.Settings(gravity=(0.0, 0.0, 0.0)))
    return w, striker, ids


def test_newtons_cradle_momentum_crosses_chain():
    w, striker, ids = _cradle(n_balls=4, speed=4.0)
    # step until impact has clearly happened
    for _ in range(30):
        w.step(1)
        if float(w.linvel(ids[-1])[0]) > 0.5:
            break
    v_last = float(w.linvel(ids[-1])[0])
    # the far ball carries most of the striker's speed
    assert v_last > 2.0, f"last ball moving at {v_last}, expected ~4"
    # interior balls stay nearly still (shock propagated through, not into)
    for i in ids[:-1]:
        vi = abs(float(w.linvel(i)[0]))
        assert vi < 1.2, f"interior ball {i} moving at {vi}"
    # striker hands off nearly all momentum
    assert abs(float(w.linvel(striker)[0])) < 1.5


def test_restitution_wave_preserves_momentum():
    w, striker, ids = _cradle(n_balls=3, speed=3.0)
    for _ in range(40):
        w.step(1)
    vs = [float(w.linvel(e)[0]) for e in [striker] + ids]
    p = sum(vs)  # all masses are 1
    assert abs(p - 3.0) < 0.15, f"momentum drifted: {p} vs 3.0 ({vs})"


def test_zero_restitution_chain_clumps():
    """Inelastic control: with e=0 the chain moves off together and no body
    exceeds the striker's initial speed."""
    w, striker, ids = _cradle(n_balls=3, speed=3.0, restitution=0.0)
    for _ in range(40):
        w.step(1)
    vs = np.array([float(w.linvel(e)[0]) for e in [striker] + ids])
    assert (vs <= 3.0 + 1e-3).all()
    assert abs(vs.sum() - 3.0) < 0.15
    # clump: velocities roughly equal
    assert vs.std() < 0.5, vs
