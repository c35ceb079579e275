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


def test_compound_rests_on_trimesh():
    """Compound body over triangle-mesh terrain (reference:
    collide_compound_mesh.cpp) — previously this pair simply didn't collide."""
    from tests.test_mesh import make_grid_mesh
    verts, tris = make_grid_mesh(10, 10, 1.0)
    n = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                 verts[tris[:, 2]] - verts[tris[:, 0]])
    flip = n[:, 1] < 0
    tris[flip] = tris[flip][:, [0, 2, 1]]
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.MeshShape(verts, tris),
        material=et.Material(friction=0.7)))
    body = b.make_rigidbody(et.RigidBodyDef(
        mass=2.0, shape=_dumbbell(), position=(0, 1.0, 0),
        material=et.Material(friction=0.7)))
    w = et.make_world(b)
    w.step(240)
    # rests on its two sphere ends (radius 0.25) on the flat mesh. (The
    # dumbbell may slowly ROLL about its sphere axis — that's physical; what
    # matters is that it doesn't sink, bounce, or slide along its axis.)
    assert abs(float(w.position(body)[1]) - 0.25) < 0.05
    v = np.asarray(w.linvel(body))
    assert abs(v[1]) < 0.05, v
    assert abs(v[0]) < 0.1, v


def test_compound_raycast_hits_children():
    """Raycast against a compound resolves per-child exact geometry
    (reference: raycast.cpp:323)."""
    b = et.WorldBuilder()
    body = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=_dumbbell(), position=(0, 0, 0)))
    w = et.make_world(b)
    # ray down onto the left sphere child (center (-0.5,0,0), r 0.25)
    out = w.raycast((-0.5, 2.0, 0.0), (-0.5, -2.0, 0.0))
    assert out["entity"] == body
    np.testing.assert_allclose(out["fraction"], (2.0 - 0.25) / 4.0, atol=1e-3)
    np.testing.assert_allclose(out["normal"], [0, 1, 0], atol=1e-3)
    # ray down onto the thin connecting bar (half height 0.08)
    out = w.raycast((0.0, 2.0, 0.0), (0.0, -2.0, 0.0))
    assert out["entity"] == body
    np.testing.assert_allclose(out["fraction"], (2.0 - 0.08) / 4.0, atol=1e-3)
    # ray that passes between the spheres above the bar: must MISS
    out = w.raycast((-0.25, 2.0, 0.2), (-0.25, -2.0, 0.2))
    assert out["entity"] == -1
