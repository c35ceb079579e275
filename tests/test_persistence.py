"""Contact point retention semantics (reference: process_collision,
include/edyn/util/collision_util.hpp:105-276; should_remove_point,
src/edyn/util/collision_util.cpp:399-413)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import edyn_tpu as et
from edyn_tpu.core.state import ContactTable
from edyn_tpu.collision.manifold import merge_points


def mk_man(piv_a, piv_b, valid, n_imp=None, lifetime=None):
    M, P = np.asarray(valid).shape
    man = ContactTable.zeros(M)
    man = dataclasses.replace(
        man,
        valid=jnp.ones((M,), bool),
        key=jnp.arange(M, dtype=jnp.int32),
        point_valid=jnp.asarray(valid, bool),
        pivot_a=jnp.asarray(piv_a, jnp.float32),
        pivot_b=jnp.asarray(piv_b, jnp.float32),
        local_normal=jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (M, P, 3)),
        normal_attachment=jnp.zeros((M, P), jnp.int32),
        normal_impulse=(jnp.asarray(n_imp, jnp.float32) if n_imp is not None
                        else jnp.zeros((M, P))),
        lifetime=(jnp.asarray(lifetime, jnp.int32) if lifetime is not None
                  else jnp.zeros((M, P), jnp.int32)),
    )
    return man


def ident_pose(M, pos_a=(0, 0, 0), pos_b=(0, 0, 0), angvel_a=(0, 0, 0),
               rolling_a=False):
    q = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (M, 4))
    z = jnp.zeros((M, 3))
    return (jnp.broadcast_to(jnp.asarray(pos_a, jnp.float32), (M, 3)), q,
            jnp.broadcast_to(jnp.asarray(angvel_a, jnp.float32), (M, 3)),
            jnp.full((M,), rolling_a, bool),
            jnp.broadcast_to(jnp.asarray(pos_b, jnp.float32), (M, 3)), q, z,
            jnp.zeros((M,), bool))


def test_unmatched_point_is_retained():
    """A point the kernel fails to re-emit survives (with impulse) as long as
    it hasn't separated or drifted."""
    piv = np.zeros((1, 4, 3), np.float32)
    piv[0, 0] = [0.5, 0.0, 0.5]
    piv[0, 1] = [-0.5, 0.0, 0.5]
    valid = np.zeros((1, 4), bool)
    valid[0, :2] = True
    man = mk_man(piv, piv, valid, n_imp=np.full((1, 4), 3.0, np.float32),
                 lifetime=np.full((1, 4), 7, np.int32))

    # fresh result re-emits only point 0
    new_pa = np.zeros((1, 4, 3), np.float32)
    new_pa[0, 0] = [0.5, 0.0, 0.5]
    nv = np.zeros((1, 4), bool)
    nv[0, 0] = True
    out = merge_points(man, jnp.asarray(new_pa), jnp.asarray(new_pa),
                       man.local_normal, man.normal_attachment,
                       jnp.zeros((1, 4)), jnp.asarray(nv),
                       pose=ident_pose(1))
    pv = np.asarray(out.point_valid[0])
    assert pv[0] and pv[1], "unmatched old point must be retained"
    assert np.asarray(out.lifetime[0])[1] == 8
    assert np.asarray(out.normal_impulse[0])[1] == 3.0


def test_separating_point_breaks():
    """Normal separation beyond contact_breaking_threshold removes a point
    that was not re-detected."""
    piv = np.zeros((1, 4, 3), np.float32)
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True
    man = mk_man(piv, piv, valid)
    nv = np.zeros((1, 4), bool)  # nothing re-detected
    # body A hovers 5 cm above B along the normal (+y)
    out = merge_points(man, man.pivot_a, man.pivot_b, man.local_normal,
                       man.normal_attachment, jnp.zeros((1, 4)),
                       jnp.asarray(nv), pose=ident_pose(1, pos_a=(0, 0.05, 0)))
    assert not np.asarray(out.point_valid).any()


def test_tangential_drift_breaks():
    piv = np.zeros((1, 4, 3), np.float32)
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True
    man = mk_man(piv, piv, valid)
    nv = np.zeros((1, 4), bool)
    out = merge_points(man, man.pivot_a, man.pivot_b, man.local_normal,
                       man.normal_attachment, jnp.zeros((1, 4)),
                       jnp.asarray(nv), pose=ident_pose(1, pos_a=(0.05, 0, 0)))
    assert not np.asarray(out.point_valid).any()
    # small drift below threshold is kept
    out = merge_points(man, man.pivot_a, man.pivot_b, man.local_normal,
                       man.normal_attachment, jnp.zeros((1, 4)),
                       jnp.asarray(nv), pose=ident_pose(1, pos_a=(0.005, 0, 0)))
    assert np.asarray(out.point_valid)[0, 0]


def test_rolling_back_rotation_match():
    """A rolling body's pivot matched against the back-rotated previous
    orientation inherits the impulse (find_nearest_contact_rolling)."""
    dt = 1.0 / 60.0
    w = 2.0  # rad/s about z
    # old pivot at object-space angle 0 -> bottom; new pivot rotated by -w*dt
    # in object space (the contact stays at the world bottom as the body rolls)
    r = 0.5
    ang = -w * dt
    old_p = np.array([[0.0, -r, 0.0]], np.float32)
    new_p = np.array([np.sin(ang) * -r * -1, -r * np.cos(ang), 0.0],
                     np.float32)  # rotate bottom point by -ang about z
    piv = np.zeros((1, 4, 3), np.float32)
    piv[0, 0] = old_p
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True
    man = mk_man(piv, piv, valid, n_imp=np.full((1, 4), 9.0, np.float32))
    new_pa = np.zeros((1, 4, 3), np.float32)
    new_pa[0, 0] = new_p
    nv = np.zeros((1, 4), bool)
    nv[0, 0] = True
    out = merge_points(man, jnp.asarray(new_pa), jnp.asarray(new_pa),
                       man.local_normal, man.normal_attachment,
                       jnp.zeros((1, 4)), jnp.asarray(nv),
                       pose=ident_pose(1, angvel_a=(0, 0, w), rolling_a=True),
                       dt=dt)
    assert np.asarray(out.normal_impulse)[0, 0] == 9.0, \
        "rolling match must inherit the accumulated impulse"
    assert np.asarray(out.lifetime)[0, 0] == 1
    np.testing.assert_allclose(np.asarray(out.pivot_a)[0, 0], new_p, atol=1e-6)


def test_max_area_insertion_replaces_weakest():
    """With a full manifold, a fresh far-away point replaces the slot whose
    removal maximizes patch area (insertion_point_index 4-point case)."""
    piv = np.zeros((1, 4, 3), np.float32)
    piv[0] = [[0, 0, 0], [0.01, 0, 0.01], [1, 0, 0], [0, 0, 1]]
    valid = np.ones((1, 4), bool)
    man = mk_man(piv, piv, valid)
    # fresh point far out extends the patch; slots 0/1 are nearly coincident
    new_pa = np.zeros((1, 4, 3), np.float32)
    new_pa[0, 0] = [1.0, 0.0, 1.0]
    nv = np.zeros((1, 4), bool)
    nv[0, 0] = True
    out = merge_points(man, jnp.asarray(new_pa), jnp.asarray(new_pa),
                       man.local_normal, man.normal_attachment,
                       jnp.zeros((1, 4)), jnp.asarray(nv),
                       pose=ident_pose(1))
    pa = np.asarray(out.pivot_a[0])
    assert np.asarray(out.point_valid).all()
    # one of the two near-duplicate slots must now hold the new corner
    hit = [np.allclose(pa[i], [1, 0, 1], atol=1e-6) for i in range(4)]
    assert hit[0] or hit[1]


def test_rotating_box_lifetimes_grow():
    """Adversarial warm-start continuity: a box slowly rotating about its
    vertical axis on the floor keeps a 4-point manifold whose lifetimes grow
    monotonically (support-sampling flicker must not zero the manifold)."""
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0)))
    box = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.5, 0.5, 0.5)), position=(0, 0.499, 0),
        material=et.Material(friction=0.8), sleeping_disabled=True))
    world = et.make_world(b, et.Settings())
    world.step(30)  # settle
    # spin slowly about +y (kinematic-style push each step)
    lifemins = []
    for i in range(40):
        st = world.state
        world.state = dataclasses.replace(
            st, angvel=st.angvel.at[box].set(jnp.array([0.0, 0.3, 0.0])))
        world.step(1)
        pv = np.asarray(world.state.contacts.point_valid)
        lt = np.asarray(world.state.contacts.lifetime)
        live = lt[pv] if pv.any() else np.array([0])
        lifemins.append(live.min() if pv.sum() else 0)
    # after the first few steps the manifold must never be rebuilt from
    # scratch: the youngest point stays above zero most steps and the count
    # of full resets is tiny
    resets = sum(1 for i in range(5, len(lifemins)) if lifemins[i] == 0)
    assert resets <= 4, f"manifold reset {resets} times: {lifemins}"
