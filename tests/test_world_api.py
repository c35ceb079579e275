"""World API parity tests (reference: util tests —
test_change_rigidbody_kind.cpp, test_set_shape.cpp, test_clear_rigidbody.cpp,
query_aabb, contact events, material mixing table)."""
import numpy as np

import edyn_tpu as et
from edyn_tpu.utils.scenes import hello_world


def test_change_kind_dynamic_to_static_and_back():
    b, box = hello_world()
    w = et.make_world(b)
    w.step(30)
    y0 = float(w.position(box)[1])
    w.set_kind(box, et.KIND_STATIC)
    w.step(60)
    assert abs(float(w.position(box)[1]) - y0) < 1e-5, "static body moved"
    w.set_kind(box, et.KIND_DYNAMIC, mass=10.0)
    w.step(30)
    assert float(w.position(box)[1]) < y0 - 0.05, "dynamic body didn't fall"


def test_gravity_api():
    """reference: get_gravity/set_gravity (util/gravity_util.hpp) — the
    global setter retargets every dynamic body still on the default."""
    b = et.WorldBuilder()
    ball = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.1), position=(0, 100, 0),
        sleeping_disabled=True))
    custom = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.1), position=(5, 100, 0),
        gravity=(0.0, -1.0, 0.0), sleeping_disabled=True))
    w = et.make_world(b)
    assert np.allclose(w.get_gravity(), (0, -9.8, 0))
    w.set_gravity((0.0, -2.0, 0.0))
    assert np.allclose(w.get_gravity(), (0, -2.0, 0))
    assert np.allclose(w.get_gravity(ball), (0, -2.0, 0))
    # a body with explicit per-body gravity keeps it
    assert np.allclose(w.get_gravity(custom), (0, -1.0, 0))
    w.step(60)
    dt = w.settings.fixed_dt
    assert abs(float(w.linvel(ball)[1]) + 2.0 * 60 * dt) < 1e-3
    assert abs(float(w.linvel(custom)[1]) + 1.0 * 60 * dt) < 1e-3


def test_mass_inertia_friction_setters():
    """reference: set_rigidbody_mass/inertia/friction (rigidbody.cpp:300-345).
    set_mass replaces mass only (inertia untouched, like the reference)."""
    b, box = hello_world()
    w = et.make_world(b)
    w.set_mass(box, 2.0)
    w.apply_impulse(box, (2.0, 0.0, 0.0))
    assert abs(float(w.linvel(box)[0]) - 1.0) < 1e-6
    w.set_inertia(box, (2.0, 2.0, 2.0))       # diagonal form
    w.apply_torque_impulse(box, (0.0, 4.0, 0.0))
    assert abs(float(w.angvel(box)[1]) - 2.0) < 1e-6
    w.set_friction(box, 0.123)
    assert abs(float(w.state.friction[box]) - 0.123) < 1e-6


def test_manifold_between():
    """reference: manifold_exists/get_manifold_entity + point iteration
    (util/contact_manifold_util.hpp:19-66)."""
    b, box = hello_world()
    w = et.make_world(b)
    w.step(1)
    assert not w.manifold_exists(0, box)   # still airborne
    w.step(239)
    m = w.manifold_between(0, box)
    assert m is not None and w.manifold_exists(box, 0)  # order-insensitive
    assert m["num_points"] >= 1
    live = m["point_valid"]
    # normal points towards body_a = the plane (collision_result.hpp:26)
    assert np.allclose(m["normal"][live], (0, -1, 0), atol=0.05)
    assert np.all(np.abs(m["position"][live][:, 1]) < 0.05)  # on the plane
    assert np.all(m["normal_impulse"][live] >= 0)


def test_set_shape():
    b, box = hello_world()
    w = et.make_world(b)
    w.step(240)
    assert abs(w.position(box)[1] - 0.2) < 0.05
    # swap the 0.2-half box for a 0.4-radius sphere: it must pop up to rest
    # at the new radius
    w.set_shape(box, et.SphereShape(0.4))
    w.wake_up(box)
    w.step(240)
    assert abs(w.position(box)[1] - 0.4) < 0.05, w.position(box)


def test_destroy_rigidbody():
    b, box = hello_world()
    w = et.make_world(b, capacity=8)
    w.step(60)
    w.destroy(box)
    w.step(5)
    assert int(np.asarray(w.state.contacts.valid).sum()) == 0
    # slot is reusable
    new = w.spawn(et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.2),
                                  position=(0, 2, 0)))
    assert new == box
    w.step(30)
    assert float(w.position(new)[1]) < 2.0


def test_query_aabb():
    b, box = hello_world()
    w = et.make_world(b)
    w.step(1)
    found = w.query_aabb((-1, 2, -1), (1, 4, 1), include_non_procedural=False)
    assert found == [box]
    found = w.query_aabb((10, 10, 10), (11, 11, 11),
                         include_non_procedural=False)
    assert found == []


def test_contact_events():
    b, box = hello_world()
    w = et.make_world(b)
    started_total = []
    ended_total = []
    for _ in range(10):
        started, ended = w.step_with_events(30)
        started_total += started
        ended_total += ended
    assert (0, box) in started_total, started_total


def test_material_mixing_table_override():
    """Pair-table override beats the default mix (reference:
    util/insert_material_mixing.hpp)."""
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.9, restitution=0.0, id=1)))
    ball = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 2.0, 0),
        material=et.Material(friction=0.9, restitution=0.0, id=2),
        sleeping_disabled=True))
    # both materials are dead (restitution 0) but the pair override is bouncy
    b.insert_material_mixing(1, 2, et.Material(restitution=0.9, friction=0.5))
    w = et.make_world(b)
    max_y = 0.0
    hit = False
    for _ in range(240):
        w.step()
        v = float(w.linvel(ball)[1])
        if v > 0.1:
            hit = True
        if hit:
            max_y = max(max_y, float(w.position(ball)[1]))
    assert hit and max_y > 0.8, (hit, max_y)


def test_custom_should_collide_fn():
    """reference: settings.should_collide_func override."""
    import dataclasses
    import jax.numpy as jnp

    def no_collide(state, i_idx, j_idx):
        # elementwise contract: i/j broadcastable index arrays
        return jnp.zeros(jnp.broadcast_shapes(i_idx.shape, j_idx.shape), bool)

    b, box = hello_world()
    w = et.make_world(b)
    w.meta = dataclasses.replace(w.meta, should_collide_fn=no_collide)
    w.step(120)
    assert float(w.position(box)[1]) < -1.0, "custom filter was ignored"


def test_overflow_counters_surface_truncation():
    """Deliberately undersized max_pairs must be REPORTED, not silent
    (VERDICT r1: silent capacity truncation)."""
    import numpy as np
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0)))
    # 6x6 grid of touching spheres on the plane: 36 plane contacts + lateral
    # neighbor overlaps >> 8 pairs
    for i in range(6):
        for j in range(6):
            b.make_rigidbody(et.RigidBodyDef(
                mass=1.0, shape=et.SphereShape(0.55),
                position=(i * 1.0, 0.5, j * 1.0)))
    w = et.make_world(b, et.Settings(), max_pairs=8)
    w.step(2)
    ovf = w.overflow_counters()
    assert ovf["broadphase_pairs"] > 0, ovf
    # healthy world reports zero
    b2 = et.WorldBuilder()
    b2.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0)))
    b2.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 0.49, 0)))
    w2 = et.make_world(b2, et.Settings())
    w2.step(2)
    assert all(v == 0 for v in w2.overflow_counters().values())
