"""Center-of-mass / origin support (reference: comp/center_of_mass.hpp,
comp/origin.hpp, sys/update_origins.cpp, apply_center_of_mass in
src/edyn/util/rigidbody.cpp:517-543, shift_moment_of_inertia in
src/edyn/dynamics/moment_of_inertia.cpp:217-220)."""
import math

import numpy as np

import edyn_tpu as et


def test_free_rotation_about_com_not_origin():
    """A free body with an offset COM spins about its COM: the stored pos
    (world COM) stays fixed while the origin orbits it."""
    b = et.WorldBuilder(gravity=(0, 0, 0))
    # def.linvel is the ORIGIN-point velocity (reference: apply_center_of_mass
    # adds omega x r_com); cancel it so the COM starts at rest
    body = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.2, 0.2, 0.2)), position=(0, 0, 0),
        center_of_mass=(0.15, 0.0, 0.0), angvel=(0, 0, 3.0),
        linvel=(0.0, -0.45, 0.0),  # -(omega x R*com)
        sleeping_disabled=True))
    w = et.make_world(b, et.Settings(gravity=(0, 0, 0)))
    com0 = np.asarray(w.position(body)).copy()
    np.testing.assert_allclose(com0, [0.15, 0, 0], atol=1e-6)
    origins = []
    for _ in range(40):
        w.step(3)
        # COM does not translate
        np.testing.assert_allclose(w.position(body), com0, atol=1e-4)
        origins.append(np.asarray(w.origin(body)))
    origins = np.array(origins)
    # origin orbits the COM at radius |com| = 0.15
    r = np.linalg.norm(origins - com0, axis=1)
    np.testing.assert_allclose(r, 0.15, atol=1e-3)
    # and it actually moves (covers > quarter turn over 2 s at 3 rad/s)
    assert np.ptp(origins[:, 1]) > 0.15


def test_offcom_box_rests_at_shape_height():
    """Collision happens in the shape (origin) frame: an off-COM box still
    rests with its geometric bottom on the plane."""
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.8)))
    box = b.make_rigidbody(et.RigidBodyDef(
        mass=2.0, shape=et.BoxShape((0.2, 0.2, 0.2)), position=(0, 1.0, 0),
        center_of_mass=(0.0, -0.1, 0.0),
        material=et.Material(friction=0.8)))
    w = et.make_world(b)
    w.step(240)
    # origin (shape center) rests at half-extent height
    assert abs(float(w.origin(box)[1]) - 0.2) < 0.02
    # stored position = COM = origin + R*com ~ 0.1
    assert abs(float(w.position(box)[1]) - 0.1) < 0.02


def test_pendulum_tips_over_with_offset_com():
    """A tall box with a high COM on a narrow base tips over; the same box
    with a low COM stays standing — COM placement changes stability."""
    def run(com_y):
        b = et.WorldBuilder()
        b.make_rigidbody(et.RigidBodyDef(
            kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
            material=et.Material(friction=0.9)))
        box = b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.BoxShape((0.08, 0.4, 0.08)),
            position=(0, 0.4, 0), center_of_mass=(0.0, com_y, 0.0),
            # slight initial tilt about z
            orientation=(0.0, 0.0, math.sin(0.06), math.cos(0.06)),
            material=et.Material(friction=0.9)))
        w = et.make_world(b)
        w.step(420)
        from edyn_tpu.math import quat
        up = np.asarray(
            quat.rotate(w.state.orn[box], np.array([0.0, 1.0, 0.0])))
        return float(up[1])
    up_low = run(-0.3)   # COM near the base: pendulum restores
    up_high = run(0.35)  # COM near the top: falls over
    assert up_low > 0.9, up_low
    assert up_high < 0.5, up_high


def test_set_center_of_mass_preserves_world_pose():
    b = et.WorldBuilder(gravity=(0, 0, 0))
    body = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.3), position=(1, 2, 3),
        angvel=(0, 0, 2.0), sleeping_disabled=True))
    w = et.make_world(b, et.Settings(gravity=(0, 0, 0)))
    origin_before = np.asarray(w.origin(body)).copy()
    w.set_center_of_mass(body, (0.2, 0.0, 0.0))
    np.testing.assert_allclose(w.origin(body), origin_before, atol=1e-6)
    # pos moved to the new world COM
    np.testing.assert_allclose(w.position(body), origin_before + [0.2, 0, 0],
                               atol=1e-6)
    # linvel picked up the omega x dr term: w=(0,0,2), dr=(0.2,0,0) -> (0,0.4,0)
    np.testing.assert_allclose(w.linvel(body), [0, 0.4, 0], atol=1e-5)


def test_spawn_and_networking_carry_com():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0)))
    w = et.make_world(b, capacity=8)
    body = w.spawn(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.2), position=(0, 1, 0),
        center_of_mass=(0.05, 0, 0)))
    np.testing.assert_allclose(np.asarray(w.state.com[body]), [0.05, 0, 0],
                               atol=1e-7)
    np.testing.assert_allclose(w.position(body), [0.05, 1, 0], atol=1e-6)
    # def round-trips through the wire dict with COM intact
    from edyn_tpu.networking.server import _def_from_dict, def_to_dict
    d = et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.2),
                        center_of_mass=(0.05, 0.0, 0.0))
    d2 = _def_from_dict(def_to_dict(d))
    np.testing.assert_allclose(d2.center_of_mass, [0.05, 0, 0])
