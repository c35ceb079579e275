"""End-to-end simulation behavior (mirrors reference integration tests:
test_broadphase.cpp, sys/test_apply_gravity.cpp, sleeping, stacks)."""
import numpy as np
import pytest

import edyn_tpu as et
from edyn_tpu.utils import scenes


def settle(world, steps):
    world.step(steps)
    world.block_until_ready()
    return world


def test_gravity_freefall():
    b = et.WorldBuilder()
    body = b.make_rigidbody(et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.1),
                                            position=(0, 100, 0)))
    w = et.make_world(b)
    dt = w.settings.fixed_dt
    settle(w, 60)
    # semi-implicit Euler: v = g*t, y = y0 - g*dt*sum(1..n)*dt
    t = 60 * dt
    assert abs(w.linvel(body)[1] + 9.8 * t) < 1e-3
    expected_y = 100 - 9.8 * dt * dt * (60 * 61) / 2
    assert abs(w.position(body)[1] - expected_y) < 1e-2


def test_hello_world_box_rests():
    b, box = scenes.hello_world()
    w = et.make_world(b)
    settle(w, 240)
    pos = w.position(box)
    assert abs(pos[1] - 0.2) < 0.05
    assert np.linalg.norm(w.linvel(box)) < 0.01
    assert w.is_asleep(box)


def test_restitution_bounce():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(restitution=1.0)))
    ball = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 2.0, 0),
        material=et.Material(restitution=0.9), sleeping_disabled=True))
    w = et.make_world(b)
    max_y = 0.0
    hit = False
    for _ in range(300):
        w.step()
        y = float(w.position(ball)[1])
        v = float(w.linvel(ball)[1])
        if v > 0.1:
            hit = True
        if hit:
            max_y = max(max_y, y)
    assert hit, "ball never bounced"
    assert max_y > 0.9  # 0.81 energy-scaled from 1.5m drop + radius


def test_wake_up_whole_island_despite_fragmented_labels():
    """wake_up must wake the body's ENTIRE contact island even while the
    on-device labels are fragmented (the 1-2 step window after each
    RESET_PERIOD label re-seed)."""
    import dataclasses
    import jax.numpy as jnp
    b, ids = scenes.box_stack(3)
    lone = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.2), position=(50.0, 0.2, 0)))
    w = et.make_world(b)
    settle(w, 300)
    assert all(w.is_asleep(i) for i in ids) and w.is_asleep(lone)
    # simulate worst-case post-reset fragmentation: identity labels
    w.state = dataclasses.replace(
        w.state, island_id=jnp.arange(w.state.capacity, dtype=jnp.int32))
    w.wake_up(ids[0])
    assert not any(w.is_asleep(i) for i in ids), \
        "label fragmentation broke whole-island wake"
    assert w.is_asleep(lone), "wake_up leaked outside the island"


def test_destroyed_support_wakes_sleeping_stack():
    """Destroying the body beneath a sleeping stack must wake the survivors
    (reference: island_manager.cpp:74-98 — destroying a graph node/edge wakes
    the island). Here the destroyed body's manifolds vanish from broadphase,
    carry_over reports them dropped, and update_sleep force-wakes the
    endpoints' islands."""
    b, ids = scenes.box_stack(2)
    w = et.make_world(b)
    settle(w, 90)                      # contacts formed, stack at rest
    w.put_to_sleep()
    w.step(2)
    assert all(w.is_asleep(i) for i in ids)
    top = ids[1]
    y0 = float(w.position(top)[1])
    w.destroy(ids[0])
    w.step(30)
    assert not w.is_asleep(top), "manifold-drop wake did not fire"
    assert float(w.position(top)[1]) < y0 - 0.02, "top box did not fall"


def test_posed_plane_broadphase():
    """A plane body with a non-identity POSITION must still pair in
    broadphase (regression: plane_clip once used the object-space plane
    constant, silently rejecting all pairs of a posed plane)."""
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        position=(0, 5.0, 0)))
    ball = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 7.0, 0)))
    w = et.make_world(b)
    settle(w, 240)
    y = float(w.position(ball)[1])
    assert abs(y - 5.5) < 0.05, f"ball fell through the posed plane: y={y}"


def test_box_stack_stability():
    """10-box stack must not collapse or drift (BASELINE config 2)."""
    b, ids = scenes.box_stack(10)
    w = et.make_world(b)
    x0 = np.array([w.position(i) for i in ids])
    settle(w, 300)
    x1 = np.array([w.position(i) for i in ids])
    drift = np.abs(x1[:, [0, 2]] - x0[:, [0, 2]]).max()
    assert drift < 0.05, f"stack drifted {drift}"
    heights = x1[:, 1]
    assert np.all(np.diff(heights) > 0.3), f"stack collapsed: {heights}"


def test_mixed_pile_settles_and_no_tunnel():
    b, ids = scenes.mixed_pile(n_bodies=60)
    w = et.make_world(b)
    settle(w, 240)
    pos = np.array([w.position(i) for i in ids])
    # no tunneling: every centroid stays above the floor (residual penetration
    # under pile weight is bounded by the position solver, like the reference)
    assert pos[:, 1].min() > 0.0, "body tunnelled through the floor"
    assert np.median(pos[:, 1]) > 0.08, "pile collapsed into the floor"
    assert np.abs(pos[:, [0, 2]]).max() < 25.0, "body escaped the bin"


def test_sleeping_and_wake_on_impulse():
    b, box = scenes.hello_world()
    w = et.make_world(b)
    settle(w, 240)
    assert w.is_asleep(box)
    w.apply_impulse(box, (0, 50.0, 0))
    assert not w.is_asleep(box)
    w.step(2)
    assert float(w.linvel(box)[1]) > 0.1


def test_force_sleep_mid_settle_sticks():
    """A pile force-slept while still jittering must STAY asleep. Two
    mechanisms under test: (1) pair generation reads the carried fat
    broadphase boxes (state.bp_aabb_*, re-seated only on escape — the
    reference's dynamic_tree::move, dynamic_tree.cpp:60-77), so sub-margin
    residual motion cannot change the pair set; (2) only drops of manifolds
    that actually HELD contact points wake islands — far candidate pairs
    have no reference equivalent (reference manifolds exist within
    ~1.3*contact_breaking of contact, broadphase.hpp:15-18) and their churn
    must not re-wake the island every step."""
    b, ids = scenes.mixed_pile(n_bodies=64)
    w = et.make_world(b)
    settle(w, 60)  # touching and piled, but NOT naturally asleep yet
    assert int(np.asarray(w.state.contacts.valid).sum()) > 0
    w.put_to_sleep()
    pos0 = np.asarray(w.state.pos).copy()
    w.step(6)
    dyn = np.asarray(w.state.is_dynamic)
    asleep = np.asarray(w.state.asleep)
    assert asleep[dyn].mean() > 0.95, \
        f"force-slept pile re-woke: {asleep[dyn].mean():.2f} asleep"
    np.testing.assert_allclose(np.asarray(w.state.pos)[dyn], pos0[dyn],
                               atol=1e-6)


def test_teleport_away_wakes_old_neighbors():
    """Teleporting a sleeping body away re-seats its fat broadphase box,
    its (pointed) manifolds leave the pair list, and the drop wakes the old
    island (reference: moving an entity destroys separated manifolds ->
    on_destroy wakes the island)."""
    import dataclasses
    import jax.numpy as jnp
    b, ids = scenes.box_stack(2)
    w = et.make_world(b)
    settle(w, 90)
    w.put_to_sleep()
    w.step(2)
    assert all(w.is_asleep(i) for i in ids)
    top, bottom = ids[1], ids[0]
    st = w.state
    w.state = dataclasses.replace(
        st, pos=st.pos.at[top].set(jnp.asarray([50.0, 5.0, 0.0],
                                               st.pos.dtype)))
    w.wake_up(top)
    w.step(3)
    assert not w.is_asleep(bottom), "pointed-manifold drop did not wake"


def test_sleeping_disabled_flag():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0)))
    box = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.2, 0.2, 0.2)), position=(0, 0.2, 0),
        sleeping_disabled=True))
    w = et.make_world(b)
    settle(w, 240)
    assert not w.is_asleep(box)


def test_collision_exclusion():
    """reference: test/edyn/test_exclusion.cpp."""
    b = et.WorldBuilder()
    a = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 0, 0), gravity=(0, 0, 0)))
    c = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 0.6, 0), gravity=(0, 0, 0)))
    b.exclude_collision(a, c)
    w = et.make_world(b)
    settle(w, 10)
    # overlapping but excluded: no manifold, no velocity change
    assert np.linalg.norm(w.linvel(a)) < 1e-6
    assert int(np.asarray(w.state.contacts.valid).sum()) == 0


def test_collision_filter_group_mask():
    b = et.WorldBuilder()
    a = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 0, 0),
        gravity=(0, 0, 0), collision_group=1, collision_mask=1))
    c = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 0.6, 0),
        gravity=(0, 0, 0), collision_group=2, collision_mask=2))
    w = et.make_world(b)
    settle(w, 10)
    assert int(np.asarray(w.state.contacts.valid).sum()) == 0


def test_kinematic_pushes_dynamic():
    b = et.WorldBuilder()
    kin = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_KINEMATIC, shape=et.BoxShape((0.5, 0.5, 0.5)),
        position=(-2.0, 0.0, 0.0), linvel=(1.0, 0, 0)))
    dyn = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 0, 0),
        gravity=(0, 0, 0)))
    w = et.make_world(b)
    settle(w, 120)
    assert w.position(kin)[0] > -0.5  # kinematic integrated
    assert w.linvel(dyn)[0] > 0.5, "dynamic body was not pushed"
    assert w.position(dyn)[0] > 0.5


def test_warm_start_impulses_persist():
    b, box = scenes.hello_world()
    w = et.make_world(b)
    settle(w, 120)
    imp = np.asarray(w.state.contacts.normal_impulse)
    assert imp.max() > 0, "no accumulated normal impulse"
    lt = np.asarray(w.state.contacts.lifetime)
    assert lt.max() > 30, "contact points are not persisting"


def test_soft_contact_sinks_and_springs():
    """Soft material contact: body rests with spring penetration instead of
    rigid correction (reference: contact_extras stiffness/damping rows)."""
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.6, stiffness=4000.0, damping=100.0)))
    box = b.make_rigidbody(et.RigidBodyDef(
        mass=10.0, shape=et.BoxShape((0.2, 0.2, 0.2)), position=(0, 0.5, 0),
        material=et.Material(friction=0.6), sleeping_disabled=True))
    w = et.make_world(b)
    w.step(420)
    y = float(w.position(box)[1])
    # equilibrium: k_eff * pen = m g; series stiffness with rigid side ~= 4000
    pen_expected = 10.0 * 9.8 / 4000.0
    assert 0.2 - y == pytest.approx(pen_expected, abs=0.01), (0.2 - y, pen_expected)
    assert abs(float(w.linvel(box)[1])) < 0.05


def test_sleep_gating_equivalence_and_wake():
    """The sleep-gated solve (stepper: lax.cond onto a 1/16-width row
    prefix) must be numerically equivalent to the ungated full-width solve,
    including EXACT equality of the asleep/wake flags, through a
    sleep -> impact -> wake cycle (reference invariant: excluding sleeping
    islands from the solver does not change behavior,
    island_manager.cpp:541-596)."""
    import dataclasses
    import jax.numpy as jnp

    def build():
        b = et.WorldBuilder()
        b.make_rigidbody(et.RigidBodyDef(
            kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
            material=et.Material(friction=0.6)))
        ids = []
        for i in range(24):
            ids.append(b.make_rigidbody(et.RigidBodyDef(
                mass=1.0, shape=et.BoxShape((0.2, 0.2, 0.2)),
                position=((i % 5) * 0.9 - 2.0, 0.2 + 0.45 * (i // 5),
                          (i % 3) * 0.9 - 0.9),
                material=et.Material(friction=0.6, restitution=0.0))))
        # the dropper: starts high, lands after the pile is asleep
        # falls ~265 steps: the pile has settled AND slept (quiet + 2 s,
        # measured: all asleep by step 210) before impact
        drop = b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.SphereShape(0.2), position=(-2.0, 90.0, -0.9),
            material=et.Material(friction=0.6, restitution=0.0),
            sleeping_disabled=True))
        # max_pairs high enough that Rfull > 1024 and the gate is active
        w = et.make_world(b, max_pairs=2048, max_manifolds=2048)
        return w, ids, drop

    w_g, ids, drop = build()
    assert w_g.meta.sleep_gating
    w_u, _, _ = build()
    w_u.meta = dataclasses.replace(w_u.meta, sleep_gating=False)

    for w in (w_g, w_u):
        w.step(240)  # settle + 2 s quiet -> pile sleeps; sphere still falls
    assert all(w_g.is_asleep(i) for i in ids)
    assert all(w_u.is_asleep(i) for i in ids)

    for w in (w_g, w_u):
        w.step(60)  # sphere lands on the corner column -> its island wakes

    np.testing.assert_array_equal(np.asarray(w_g.state.asleep),
                                  np.asarray(w_u.state.asleep))
    np.testing.assert_allclose(np.asarray(w_g.state.pos),
                               np.asarray(w_u.state.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_g.state.linvel),
                               np.asarray(w_u.state.linvel), atol=1e-4)
    # the impact actually woke the pile through the gated path
    assert not w_g.is_asleep(ids[0])


def test_island_steady_skip_engages_and_resets():
    """A sleeping world's contact/joint edge set stops changing, so the
    island stability counter climbs past 2*RESET_PERIOD and label
    propagation is skipped under lax.cond with the stored converged labels
    (reference: the island graph is incremental and only recomputes on edge
    events, island_manager.cpp:74-98); a body/joint lifecycle event resets
    the counter so the next steps recompute labels."""
    from edyn_tpu.dynamics.islands import RESET_PERIOD

    b, ids = scenes.mixed_pile(n_bodies=48)
    w = et.make_world(b, capacity=len(b.defs) + 8, max_joints=4)
    settle(w, 60)
    w.put_to_sleep()
    w.step(2 * RESET_PERIOD + 6)
    assert int(w.state.island_stable_steps) >= 2 * RESET_PERIOD, \
        f"stability counter stuck at {int(w.state.island_stable_steps)}"
    assert bool(w.state.labels_stable)
    labels = np.asarray(w.state.island_id).copy()
    w.step(4)  # the skip path reuses the stored labels verbatim
    np.testing.assert_array_equal(np.asarray(w.state.island_id), labels)
    dyn = np.asarray(w.state.is_dynamic)
    assert np.asarray(w.state.asleep)[dyn].mean() > 0.95

    # a lifecycle edit (graph edge change the device step cannot see)
    # must invalidate the skip
    j = et.make_distance_constraint(w, ids[0], ids[1], (0, 0, 0), (0, 0, 0),
                                    5.0)
    assert int(w.state.island_stable_steps) == 0
    assert not bool(w.state.labels_stable)
    w.destroy_joint(j)
    assert int(w.state.island_stable_steps) == 0
