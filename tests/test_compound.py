"""Compound shape tests (reference: compound_shape + collide_compound_*)."""
import numpy as np

import edyn_tpu as et


def _dumbbell():
    return et.CompoundShape(children=[
        (et.SphereShape(0.25), (-0.5, 0, 0), (0, 0, 0, 1)),
        (et.SphereShape(0.25), (0.5, 0, 0), (0, 0, 0, 1)),
        (et.BoxShape((0.5, 0.08, 0.08)), (0, 0, 0), (0, 0, 0, 1)),
    ])


def test_compound_rests_on_plane():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.6)))
    body = b.make_rigidbody(et.RigidBodyDef(
        mass=2.0, shape=_dumbbell(), position=(0, 1.5, 0),
        material=et.Material(friction=0.6)))
    w = et.make_world(b)
    w.step(240)
    # rests on its two sphere ends
    assert abs(float(w.position(body)[1]) - 0.25) < 0.05


def test_convex_vs_compound():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.6)))
    body = b.make_rigidbody(et.RigidBodyDef(
        mass=2.0, shape=_dumbbell(), position=(0, 0.25, 0),
        material=et.Material(friction=0.6)))
    ball = b.make_rigidbody(et.RigidBodyDef(
        mass=0.5, shape=et.SphereShape(0.2), position=(0.4, 2.0, 0.0),
        material=et.Material(friction=0.4, roll_friction=0.01)))
    w = et.make_world(b)
    hit_compound = False
    for _ in range(240):
        w.step()
        if float(w.position(ball)[1]) > 0.3 and \
                abs(float(w.linvel(ball)[0])) > 0.05:
            hit_compound = True
    assert hit_compound, "ball never bounced off the compound"
    assert float(w.position(ball)[1]) > 0.05  # no tunnelling


def test_compound_vs_compound():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.6)))
    d = _dumbbell()
    lower = b.make_rigidbody(et.RigidBodyDef(
        mass=2.0, shape=d, position=(0, 0.25, 0),
        material=et.Material(friction=0.6)))
    upper = b.make_rigidbody(et.RigidBodyDef(
        mass=2.0, shape=d, position=(0, 1.5, 0),
        orientation=(0, np.sin(np.pi / 4), 0, np.cos(np.pi / 4)),  # crossed
        material=et.Material(friction=0.6)))
    w = et.make_world(b)
    w.step(300)
    y = float(w.position(upper)[1])
    assert 0.4 < y < 0.9, f"upper dumbbell should rest crossed on lower: {y}"


def test_compound_inertia_reasonable():
    from edyn_tpu.shapes.compound import compound_mass_properties
    I, com = compound_mass_properties(_dumbbell(), 2.0)
    # dumbbell: I about the long axis (x) much smaller than about y/z
    assert I[0, 0] < I[1, 1] * 0.5
    assert abs(com[0]) < 1e-6
