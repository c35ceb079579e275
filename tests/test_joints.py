"""Joint behavior tests (reference: the constraint family,
include/edyn/constraints/)."""
import numpy as np
import pytest

import edyn_tpu as et


def settle(w, n):
    w.step(n)
    w.block_until_ready()
    return w


def test_distance_constraint_holds_length():
    b = et.WorldBuilder()
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, position=(0, 2, 0), shape=None, material=None))
    bob = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.1), position=(1.0, 2.0, 0.0),
        sleeping_disabled=True))
    et.make_distance_constraint(b, anchor, bob, (0, 0, 0), (0, 0, 0), 1.0)
    w = et.make_world(b)
    settle(w, 300)
    d = np.linalg.norm(w.position(bob) - np.array([0, 2, 0]))
    assert abs(d - 1.0) < 0.05, d
    # pendulum ends below the anchor
    assert w.position(bob)[1] < 2.0


def test_point_constraint_pivot_stays():
    b = et.WorldBuilder()
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, position=(0, 2, 0), shape=None, material=None))
    rod = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.CapsuleShape(0.05, 0.5), position=(0.5, 2.0, 0.0),
        sleeping_disabled=True))
    et.make_point_constraint(b, anchor, rod, (0, 0, 0), (-0.5, 0, 0))
    w = et.make_world(b)
    for _ in range(10):
        settle(w, 30)
        # pivot point on the rod must remain at the anchor
        from edyn_tpu.math import quat
        import jax.numpy as jnp
        piv = np.asarray(w.state.pos[rod] + quat.rotate(
            w.state.orn[rod], jnp.array([-0.5, 0.0, 0.0])))
        assert np.linalg.norm(piv - [0, 2, 0]) < 0.05, piv


def test_hinge_constraint_axis_locked():
    """Rod on a z-axis hinge: swings in the xy plane only."""
    b = et.WorldBuilder()
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, position=(0, 2, 0), shape=None, material=None))
    rod = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.CapsuleShape(0.05, 0.4), position=(0.4, 2.0, 0.0),
        sleeping_disabled=True))
    et.make_hinge_constraint(b, anchor, rod, (0, 0, 0), (-0.4, 0, 0),
                             (0, 0, 1), (0, 0, 1))
    w = et.make_world(b)
    for _ in range(6):
        settle(w, 50)
        p = w.position(rod)
        assert abs(p[2]) < 0.02, "hinge let the rod leave its plane"
        av = w.angvel(rod)
        assert abs(av[0]) < 0.5 and abs(av[1]) < 0.5


def test_hinge_limit():
    """Hinge with tight limits must not swing past them."""
    b = et.WorldBuilder()
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, position=(0, 2, 0), shape=None, material=None))
    rod = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.CapsuleShape(0.05, 0.4), position=(0.4, 2.0, 0.0),
        sleeping_disabled=True))
    et.make_hinge_constraint(b, anchor, rod, (0, 0, 0), (-0.4, 0, 0),
                             (0, 0, 1), (0, 0, 1),
                             has_limit=True, limit_min=-0.3, limit_max=0.3)
    w = et.make_world(b)
    settle(w, 240)
    # without the limit the rod would hang straight down (-90 deg); with
    # +-0.3 rad it stays near the limit
    p = w.position(rod)
    angle = np.arctan2(-p[1] + 2.0, p[0])
    assert angle < 0.45, f"swung past limit: {angle}"


def test_soft_distance_spring_oscillates_and_damps():
    b = et.WorldBuilder()
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, position=(0, 3, 0), shape=None, material=None))
    bob = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.1), position=(0, 2.0, 0),
        sleeping_disabled=True))
    et.make_soft_distance_constraint(b, anchor, bob, (0, 0, 0), (0, 0, 0),
                                     distance=1.0, stiffness=200.0, damping=5.0)
    w = et.make_world(b)
    settle(w, 600)
    # settles at rest length + gravity sag (g*m/k = 0.049)
    y = float(w.position(bob)[1])
    assert abs(y - (3.0 - 1.049)) < 0.1, y
    assert np.linalg.norm(w.linvel(bob)) < 0.2


def test_cone_constraint_limits_swing():
    b = et.WorldBuilder()
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, position=(0, 2, 0), shape=None, material=None))
    rod = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.CapsuleShape(0.05, 0.4), position=(0.4, 2.0, 0.0),
        sleeping_disabled=True))
    et.make_point_constraint(b, anchor, rod, (0, 0, 0), (-0.4, 0, 0))
    et.make_cone_constraint(b, anchor, rod, (0, 0, 0), (-0.4, 0, 0),
                            axis_a=(1, 0, 0), axis_b=(1, 0, 0),
                            span_y=0.4, span_z=0.4)
    w = et.make_world(b)
    settle(w, 300)
    # rod's axis must stay within ~the cone around +x rather than hanging
    # straight down
    from edyn_tpu.math import quat
    import jax.numpy as jnp
    ax = np.asarray(quat.rotate(w.state.orn[rod], jnp.array([1.0, 0, 0])))
    angle = np.arccos(np.clip(ax[0], -1, 1))
    assert angle < 0.7, f"swung outside cone: {angle}"


def test_joint_chain_hangs():
    from edyn_tpu.utils import scenes
    b, ids = scenes.joint_chain(6)
    w = et.make_world(b)
    settle(w, 400)
    # chain ends below anchor, links stay connected
    tip = w.position(ids[-1])
    assert tip[1] < 5.0
    for a, bb in zip(ids[:-1], ids[1:]):
        gap = np.linalg.norm(w.position(a) - w.position(bb))
        assert gap < 0.7, f"chain broke: {gap}"


def test_null_constraint_shares_island():
    b = et.WorldBuilder()
    x = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.1), position=(0, 0, 0),
        gravity=(0, 0, 0)))
    y = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.1), position=(5, 0, 0),
        gravity=(0, 0, 0)))
    et.make_null_constraint(b, x, y)
    w = et.make_world(b)
    settle(w, 5)
    assert int(w.state.island_id[x]) == int(w.state.island_id[y])
