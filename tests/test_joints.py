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


def test_hinge_limit_restitution_bounce():
    """A swinging hinge that hits its limit with limit_restitution=0.5 must
    bounce back with ~half the angular speed (reference: per-row
    constraint_row_options restitution, hinge_constraint.cpp:112-113 ->
    constraint_row.cpp:21 rhs = -(error*erp + relvel*(1+restitution)))."""
    import jax.numpy as jnp
    import dataclasses

    def run(rest, w0=8.0):
        b = et.WorldBuilder()
        anchor = b.make_rigidbody(et.RigidBodyDef(
            kind=et.KIND_STATIC, position=(0, 2, 0), shape=None, material=None))
        rod = b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.CapsuleShape(0.05, 0.4),
            position=(0.4, 2.0, 0.0), sleeping_disabled=True))
        et.make_hinge_constraint(b, anchor, rod, (0, 0, 0), (-0.4, 0, 0),
                                 (0, 0, 1), (0, 0, 1),
                                 has_limit=True, limit_min=-0.25,
                                 limit_max=0.25, limit_restitution=rest)
        w = et.make_world(b, et.Settings(gravity=(0, 0, 0)))
        # spin the rod about the PIVOT toward the +limit: angvel w0*z plus
        # the COM linvel w x r that makes the pivot stationary (angvel
        # alone would be COM rotation, which the pivot rows redistribute)
        w.state = dataclasses.replace(
            w.state,
            angvel=w.state.angvel.at[rod].set(jnp.asarray([0.0, 0.0, w0])),
            linvel=w.state.linvel.at[rod].set(
                jnp.asarray([0.0, 0.4 * w0, 0.0])))
        speeds = []
        for _ in range(25):
            w.step(1)
            speeds.append(float(w.angvel(rod)[2]))
        return np.asarray(speeds)

    s0 = run(0.0)
    s5 = run(0.5)
    s1 = run(1.0)
    # inelastic: brakes to a stop, never meaningfully reverses (the
    # speculative row sheds the approach before the bound)
    assert s0.min() > -0.35, f"e=0 should not bounce: {s0.min()}"
    # restitution: rebound speed grows monotonically with e
    assert s5.min() < -0.5, f"e=0.5 should bounce: {s5.min()}"
    assert s1.min() < s5.min() - 0.5, \
        f"e=1 should bounce harder than e=0.5: {s1.min()} vs {s5.min()}"


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


def test_generic_linear_limit_slider():
    """Generic with one free-range linear DOF = slider with end stops
    (reference: generic_constraint linear_dof offset_min/max)."""
    b = et.WorldBuilder(gravity=(0.0, 0.0, 0.0))
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.SphereShape(0.05), position=(0, 2, 0)))
    slider = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.1, 0.1, 0.1)), position=(0, 2, 0),
        linvel=(2.0, 0, 0)))
    et.make_generic_constraint(
        b, anchor, slider, (0, 0, 0), (0, 0, 0),
        linear_dofs=(et.dof(offset_min=-0.5, offset_max=0.5),
                     et.dof(), et.dof()))
    w = et.make_world(b)
    xs = []
    for _ in range(90):
        w.step(1)
        xs.append(float(w.position(slider)[0]))
    # stays within the +-0.5 slot (small overshoot tolerance)
    assert max(abs(x) for x in xs) < 0.56, max(xs)
    # actually reached the stop
    assert max(xs) > 0.44, max(xs)
    # y/z locked
    assert abs(float(w.position(slider)[1]) - 2.0) < 1e-2
    assert abs(float(w.position(slider)[2])) < 1e-2


def test_generic_linear_spring_oscillates():
    """Linear DOF spring: rest offset restoring force (reference
    generic_constraint.cpp:93-108)."""
    b = et.WorldBuilder(gravity=(0.0, 0.0, 0.0))
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.SphereShape(0.05), position=(0, 2, 0)))
    m = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.1, 0.1, 0.1)), position=(0.4, 2, 0)))
    et.make_generic_constraint(
        b, anchor, m, (0, 0, 0), (0, 0, 0),
        linear_dofs=(et.dof(limit_enabled=False, spring_stiffness=30.0,
                            damping=0.3),
                     et.dof(), et.dof()),
        disable_collision=True)
    w = et.make_world(b)
    xs = []
    for _ in range(240):
        w.step(1)
        xs.append(float(w.position(m)[0]))
    # oscillates through the rest offset and decays
    assert min(xs[:80]) < -0.1
    assert abs(xs[-1]) < 0.15, xs[-1]


def test_generic_angular_friction_spins_down():
    """Angular DOF friction torque decelerates relative spin (reference
    generic_constraint.cpp angular friction_torque)."""
    b = et.WorldBuilder(gravity=(0.0, 0.0, 0.0))
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.SphereShape(0.05), position=(0, 2, 0)))
    m = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.2, 0.2, 0.2)), position=(0, 2, 0),
        angvel=(5.0, 0, 0)))
    et.make_generic_constraint(
        b, anchor, m, (0, 0, 0), (0, 0, 0),
        linear_dofs=(et.dof(), et.dof(), et.dof()),
        angular_dofs=(et.dof(limit_enabled=False, friction=0.2),
                      et.dof(limit_enabled=False),
                      et.dof(limit_enabled=False)))
    w = et.make_world(b)
    w0 = float(w.angvel(m)[0])
    spds = []
    for _ in range(120):
        w.step(1)
        spds.append(float(w.angvel(m)[0]))
    # constant-torque deceleration: ~linear ramp down, eventually stopped
    assert spds[30] < w0 * 0.8
    assert abs(spds[-1]) < 0.5, spds[-1]


def test_hinge_bump_stop_soft_landing():
    """Hinge bump stop engages before the hard limit: with a stiff bump-stop
    spring the swing reverses before/at the limit with far smaller limit
    impulse (reference hinge_constraint.hpp bump_stop_*)."""
    import numpy as np

    def run(bump_k):
        b = et.WorldBuilder(gravity=(0.0, 0.0, 0.0))
        anchor = b.make_rigidbody(et.RigidBodyDef(
            kind=et.KIND_STATIC, shape=et.SphereShape(0.05),
            position=(0, 2, 0)))
        arm = b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.BoxShape((0.4, 0.05, 0.05)),
            position=(0.5, 2, 0), angvel=(0, 0, 3.0), linvel=(0, 1.5, 0)))
        et.make_hinge_constraint(
            b, anchor, arm, (0, 0, 0), (-0.5, 0, 0), (0, 0, 1), (0, 0, 1),
            limit_min=-1.0, limit_max=1.0, has_limit=True,
            bump_stop_stiffness=bump_k, bump_stop_angle=0.4)
        w = et.make_world(b)
        angs = []
        for _ in range(60):
            w.step(1)
            p = np.asarray(w.position(arm)) - np.array([0, 2, 0])
            angs.append(np.arctan2(p[1], p[0]))
        return np.asarray(angs)

    hard = run(0.0)
    soft = run(60.0)
    # both respect the hard limit (small velocity-level overshoot allowed:
    # the limit row is speculative, correction completes over ~2 steps)
    assert hard.max() < 1.15 and soft.max() < 1.15
    # the bump stop turns the arm earlier than the hard limit does
    assert soft.max() < hard.max() - 0.05, (soft.max(), hard.max())


def test_cvjoint_twist_limits_and_bend_spring():
    """CV joint: twist constrained to its range; bend spring pulls B's axis
    toward rest_direction (reference cvjoint_constraint.cpp)."""
    import numpy as np
    b = et.WorldBuilder(gravity=(0.0, 0.0, 0.0))
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.SphereShape(0.05), position=(0, 2, 0)))
    m = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.1, 0.1, 0.3)), position=(0, 2, 0.6),
        angvel=(0, 0, 4.0)))
    et.make_cvjoint_constraint(
        b, anchor, m, (0, 0, 0.3), (0, 0, -0.3), (0, 0, 1), (0, 0, 1),
        twist_min=-0.4, twist_max=0.4)
    w = et.make_world(b)
    from edyn_tpu.constraints.joints import JointType
    for _ in range(90):
        w.step(1)
    ang = float(np.asarray(w.state.joints.angle)[0])
    assert abs(ang) < 0.5, ang  # twist held to the limit range
    wz = float(w.angvel(m)[2])
    assert abs(wz) < 0.6, wz


def test_cvjoint_twist_lock_transmits_rotation():
    """Default cvjoint (min == max) = constant-velocity coupling: driving A's
    twist velocity drags B along (the joint's defining behavior)."""
    import numpy as np
    b = et.WorldBuilder(gravity=(0.0, 0.0, 0.0))
    drv = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_KINEMATIC, shape=et.CylinderShape(0.2, 0.3, axis=2),
        position=(0, 2, 0), angvel=(0, 0, 3.0)))
    out = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.CylinderShape(0.2, 0.3, axis=2),
        position=(0, 2, 0.8)))
    et.make_cvjoint_constraint(b, drv, out, (0, 0, 0.4), (0, 0, -0.4),
                               (0, 0, 1), (0, 0, 1))
    w = et.make_world(b)
    w.step(60)
    wz = float(w.angvel(out)[2])
    assert abs(wz - 3.0) < 0.2, wz


def test_runtime_joint_create_and_destroy():
    """Constraints on a LIVE world (reference: make_constraint on a live
    registry, util/constraint_util.hpp; destroying a constraint entity wakes
    its island, island_manager.cpp:74-98). The constraints.api factories
    duck-type over WorldBuilder and World."""
    b = et.WorldBuilder()
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.SphereShape(0.1), position=(0, 5, 0)))
    ball = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.2), position=(0, 3, 0),
        sleeping_disabled=True))
    w = et.make_world(b, max_joints=4)

    j = et.make_distance_constraint(w, anchor, ball, (0, 0, 0), (0, 0, 0),
                                    distance=2.0)
    w.step(120)
    d = float(np.linalg.norm(np.asarray(w.position(ball))
                             - np.asarray(w.position(anchor))))
    assert abs(d - 2.0) < 0.1, f"runtime joint not enforced: d={d}"

    w.destroy_joint(j)
    w.step(60)
    d = float(np.linalg.norm(np.asarray(w.position(ball))
                             - np.asarray(w.position(anchor))))
    assert d > 2.3, f"destroyed joint still constrains: d={d}"


def test_runtime_joint_into_joint_free_world_rejits():
    """Adding the first joint to a world built without any must flip the
    compiled-out joint phases back on (meta.has_joints re-jit)."""
    b = et.WorldBuilder(gravity=(0.0, 0.0, 0.0))
    a = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.2), position=(0, 0, 0),
        sleeping_disabled=True))
    c = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.2), position=(1, 0, 0),
        linvel=(1.0, 0, 0), sleeping_disabled=True))
    w = et.make_world(b, max_joints=2)
    assert not w.meta.has_joints
    et.make_distance_constraint(w, a, c, (0, 0, 0), (0, 0, 0), distance=1.0)
    assert w.meta.has_joints
    w.step(60)
    d = float(np.linalg.norm(np.asarray(w.position(c))
                             - np.asarray(w.position(a))))
    assert abs(d - 1.0) < 0.15, d
