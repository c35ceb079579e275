"""Roll-direction-aligned rolling resistance (reference:
comp/roll_direction.hpp, contact_extras_constraint.cpp:44-56,
util/rigidbody.cpp:119-127)."""
import numpy as np

import edyn_tpu as et
from edyn_tpu.dynamics.solver import build_contact_rows


def _cyl_on_plane():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.8, roll_friction=0.05)))
    cyl = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.CylinderShape(0.3, 0.2, axis=0),
        position=(0, 0.3, 0),
        material=et.Material(friction=0.8, roll_friction=0.05),
        sleeping_disabled=True))
    return b, cyl


def test_roll_axis_assigned_from_shape():
    b, cyl = _cyl_on_plane()
    w = et.make_world(b)
    np.testing.assert_allclose(np.asarray(w.state.roll_axis[cyl]), [1, 0, 0])
    # plane body has no restricted roll direction
    np.testing.assert_allclose(np.asarray(w.state.roll_axis[0]), [0, 0, 0])
    # set_shape keeps it in sync
    w.set_shape(cyl, et.SphereShape(0.3))
    np.testing.assert_allclose(np.asarray(w.state.roll_axis[cyl]), [0, 0, 0])
    w.set_shape(cyl, et.CylinderShape(0.3, 0.2, axis=2))
    np.testing.assert_allclose(np.asarray(w.state.roll_axis[cyl]), [0, 0, 1])


def test_rolling_rows_aligned_with_roll_axis():
    """Cylinder axis = world x, contact normal = y: the rolling row along x
    keeps its response, the row along z (off-axis 'rolling') loses it."""
    b, cyl = _cyl_on_plane()
    w = et.make_world(b)
    w.step(2)  # generate manifolds
    w.block_until_ready()
    rows = build_contact_rows(w.state, w.state.contacts,
                              w.settings.fixed_dt, False)
    valid = np.asarray(rows.valid)
    assert valid.any()
    t1 = np.asarray(rows.t1)[valid]
    roll_t1 = np.asarray(rows.roll_t1)[valid]
    roll_t2 = np.asarray(rows.roll_t2)[valid]
    # world roll axis is x: the aligned axes must have no z component and the
    # pair (roll_t1, roll_t2) projects the tangent basis onto x
    axis = np.array([1.0, 0, 0])
    for rt, t in ((roll_t1, t1), (np.asarray(rows.roll_t2)[valid],
                                  np.asarray(rows.t2)[valid])):
        expect = t * (t @ axis)[:, None]
        np.testing.assert_allclose(rt, expect, atol=1e-5)
    # at least one of the two rows is (near-)dead when its tangent ⟂ x
    mags = np.stack([np.linalg.norm(roll_t1, axis=1),
                     np.linalg.norm(roll_t2, axis=1)])
    assert (mags.min(0) < 1e-3).all() or (mags.max(0) > 0.9).any()


def test_coasting_wheel_decelerates_on_axis():
    """A wheel rolling forward (about its x axis) decelerates; its angular
    velocity never grows an off-axis component from rolling resistance."""
    b, cyl = _cyl_on_plane()
    w = et.make_world(b)
    wsp = 5.0
    w.set_velocity(cyl, linvel=(0, 0, wsp * 0.3), angvel=(-wsp, 0, 0))
    w0 = abs(float(w.angvel(cyl)[0]))
    for _ in range(90):
        w.step()
    wv = np.asarray(w.angvel(cyl))
    assert abs(wv[0]) < w0  # decelerated along the roll axis
    assert abs(wv[1]) < 0.1 and abs(wv[2]) < 0.1  # no off-axis growth
