"""Trimesh terrain tests (mirrors reference shapes/test_trimesh.cpp +
mesh collide kernels)."""
import numpy as np
import pytest

import edyn_tpu as et


def make_grid_mesh(nx=8, nz=8, size=1.0, height_fn=None):
    """Triangulated height grid."""
    xs = np.arange(nx) * size - (nx - 1) * size / 2
    zs = np.arange(nz) * size - (nz - 1) * size / 2
    verts = []
    for x in xs:
        for z in zs:
            y = height_fn(x, z) if height_fn else 0.0
            verts.append((x, y, z))
    verts = np.asarray(verts, np.float32)
    tris = []
    for i in range(nx - 1):
        for j in range(nz - 1):
            a = i * nz + j
            b = (i + 1) * nz + j
            c = i * nz + (j + 1)
            d = (i + 1) * nz + (j + 1)
            tris.append((a, b, c))
            tris.append((c, b, d))
    return verts, np.asarray(tris, np.int64)


def _terrain_world(height_fn=None, bodies=()):
    verts, tris = make_grid_mesh(10, 10, 1.0, height_fn)
    # fix winding so normals point up
    n = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                 verts[tris[:, 2]] - verts[tris[:, 0]])
    flip = n[:, 1] < 0
    tris[flip] = tris[flip][:, [0, 2, 1]]
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.MeshShape(verts, tris),
        material=et.Material(friction=0.7)))
    ids = [b.make_rigidbody(d) for d in bodies]
    return et.make_world(b), ids


def test_sphere_rests_on_flat_terrain():
    w, (ball,) = _terrain_world(bodies=[et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.3), position=(0.3, 2.0, 0.2),
        material=et.Material(friction=0.6, roll_friction=0.01))])
    w.step(240)
    pos = w.position(ball)
    assert abs(pos[1] - 0.3) < 0.05, pos
    assert np.linalg.norm(w.linvel(ball)) < 0.05


def test_box_rests_on_flat_terrain_no_edge_snag():
    """Box sliding across interior triangle edges must not catch ghost
    normals (Voronoi internal-edge rejection, Design.md:167-171)."""
    w, (box,) = _terrain_world(bodies=[et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.3, 0.2, 0.3)), position=(-2.0, 0.25, 0.0),
        linvel=(3.0, 0, 0), material=et.Material(friction=0.05),
        sleeping_disabled=True)])
    ys = []
    for _ in range(120):
        w.step()
        ys.append(float(w.position(box)[1]))
    # never bounces above resting height + tolerance
    assert max(ys[10:]) < 0.35, max(ys[10:])
    assert abs(ys[-1] - 0.2) < 0.05
    # slid forward by ~v^2/(2*mu*g) = 2.4m (Coulomb stop distance with the
    # mixed friction sqrt(0.05*0.7))
    assert 1.5 < float(w.position(box)[0]) - (-2.0) < 3.5


def test_sphere_rolls_into_valley():
    w, (ball,) = _terrain_world(
        height_fn=lambda x, z: 0.15 * (x * x) / 4.0,
        bodies=[et.RigidBodyDef(
            mass=1.0, shape=et.SphereShape(0.3), position=(-3.0, 1.5, 0.0),
            material=et.Material(friction=0.4))])
    reached_valley = False
    for _ in range(60):
        w.step(10)
        x = abs(float(w.position(ball)[0]))
        assert x < 4.0, "ball escaped the bowl"
        if x < 1.0:
            reached_valley = True
    # oscillates in the bowl (no rolling resistance on a frictionless arc)
    # but must pass through the valley floor and stay contained
    assert reached_valley
    assert float(w.position(ball)[1]) < 1.2


def test_raycast_mesh():
    w, _ = _terrain_world()
    w.step(1)
    hit = w.raycast((0.25, 5.0, 0.25), (0.25, -5.0, 0.25))
    assert hit["entity"] == 0
    np.testing.assert_allclose(hit["fraction"], 0.5, atol=1e-3)
    np.testing.assert_allclose(hit["normal"], [0, 1, 0], atol=1e-3)


def test_polyhedron_on_terrain():
    tet = et.PolyhedronShape(np.array(
        [[0.2, 0.2, 0.2], [0.2, -0.2, -0.2],
         [-0.2, 0.2, -0.2], [-0.2, -0.2, 0.2]], np.float32))
    w, (body,) = _terrain_world(bodies=[et.RigidBodyDef(
        mass=1.0, shape=tet, position=(0.1, 1.5, -0.1),
        material=et.Material(friction=0.6))])
    w.step(300)
    # settled: height in range and positionally stable over the last second
    ys = []
    for _ in range(60):
        w.step()
        ys.append(float(w.position(body)[1]))
    assert 0.0 < ys[-1] < 0.4, ys[-1]
    assert max(ys) - min(ys) < 0.03, (min(ys), max(ys))


def test_per_triangle_materials_two_zones():
    """Ice/asphalt terrain: identical boxes slide much farther on the
    low-friction zone (per-vertex -> per-triangle material scales wired into
    contact rows; reference Design.md:199-203)."""
    verts, tris = make_grid_mesh(20, 6, 1.0)
    n = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                 verts[tris[:, 2]] - verts[tris[:, 0]])
    flip = n[:, 1] < 0
    tris[flip] = tris[flip][:, [0, 2, 1]]
    # z < 0 half: ice (friction scale ~0); z > 0 half: asphalt (1.0)
    vf = np.where(verts[:, 2] < 0, 0.02, 1.0).astype(np.float32)
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC,
        shape=et.MeshShape(verts, tris, vertex_friction=vf),
        material=et.Material(friction=0.8)))
    kick = (4.0, 0.0, 0.0)
    ice = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.2, 0.2, 0.2)),
        position=(-8.0, 0.21, -1.5), linvel=kick,
        material=et.Material(friction=0.8)))
    asphalt = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.2, 0.2, 0.2)),
        position=(-8.0, 0.21, 1.5), linvel=kick,
        material=et.Material(friction=0.8)))
    w = et.make_world(b)
    w.step(120)
    x_ice = float(w.position(ice)[0])
    x_asp = float(w.position(asphalt)[0])
    slide_ice = x_ice + 8.0
    slide_asp = x_asp + 8.0
    assert slide_asp < slide_ice - 1.0, (slide_ice, slide_asp)
    # asphalt box stops quickly (mu ~0.78): v^2/(2 mu g) ~ 1.0m
    assert abs(float(w.linvel(asphalt)[0])) < 0.1
