"""Broadphase pair-list carry: when no admission box re-seats, the step
reuses last step's sorted pair list (stepper.physics_step_impl reuse_pairs).
Reference analogue: dynamic_tree::move() returns false for non-escaping
AABBs and no re-query happens (src/edyn/collision/dynamic_tree.cpp:60-77)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

import edyn_tpu as et


def _pile(n=12, spacing=1.2):
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.6)))
    rng = np.random.RandomState(3)
    for i in range(n):
        b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.BoxShape((0.4, 0.4, 0.4)),
            position=(rng.uniform(-1.5, 1.5), 0.5 + spacing * i,
                      rng.uniform(-1.5, 1.5)),
            material=et.Material(friction=0.7, restitution=0.0)))
    return b


def test_carry_engages_and_trajectory_matches():
    """A settled pile must engage the carry (bp_carry_ok True, no escapes)
    and produce the same trajectory as a world with the carry disabled via
    per-step host invalidation."""
    w = et.make_world(_pile(), et.Settings())
    wref = et.make_world(_pile(), et.Settings())

    for _ in range(150):
        w.step()
        wref._reset_island_stability()   # forces recompute every step
        wref.step()

    np.testing.assert_allclose(np.asarray(w.state.pos),
                               np.asarray(wref.state.pos),
                               rtol=1e-5, atol=1e-5)
    # settled pile: nothing re-seats, the carry flag holds
    assert bool(w.state.bp_carry_ok)
    # both worlds found identical pair lists
    np.testing.assert_array_equal(np.asarray(w.state.contacts.sort_key),
                                  np.asarray(wref.state.contacts.sort_key))


def test_spawn_after_settle_collides():
    """A body spawned into a settled (carry-engaged) world must produce
    fresh pairs — via the host carry reset AND its own box escape."""
    w = et.make_world(_pile(n=4), et.Settings(), capacity=8)
    for _ in range(200):
        w.step()
    h0 = float(np.asarray(w.state.pos)[1:5, 1].max())
    i = w.spawn(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.3), position=(0.0, h0 + 2.0, 0.0),
        material=et.Material(friction=0.5, restitution=0.0)))
    for _ in range(240):
        w.step()
    y = float(w.position(i)[1])
    # the sphere must have landed ON the pile/floor, not tunneled through
    assert y > 0.25, f"spawned sphere fell through (y={y})"


def test_exclusion_applies_after_carry():
    """exclude_collision on a carry-engaged world must take effect (the
    host reset invalidates the carried pair list)."""
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0)))
    box = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.4, 0.4, 0.4)), position=(0, 0.4, 0)))
    w = et.make_world(b, et.Settings())
    for _ in range(120):
        w.step()
    assert float(w.position(box)[1]) > 0.3      # resting on the plane
    w.exclude_collision(0, box)
    for _ in range(60):
        w.step()
    assert float(w.position(box)[1]) < -0.5, \
        "exclusion did not take effect after the pair carry engaged"
