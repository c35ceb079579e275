"""Raycast goldens (mirrors reference test/edyn/test_raycast.cpp: rays against
analytically placed shapes, asserting hit entity, fraction and normal)."""
import numpy as np

import edyn_tpu as et


def _world_with(shapes_positions):
    b = et.WorldBuilder()
    ids = []
    for shape, pos in shapes_positions:
        ids.append(b.make_rigidbody(et.RigidBodyDef(
            kind=et.KIND_STATIC, shape=shape, position=pos)))
    w = et.make_world(b)
    w.step(1)  # compute AABBs
    return w, ids


def test_ray_sphere():
    w, ids = _world_with([(et.SphereShape(1.0), (0, 0, 0))])
    hit = w.raycast((0, 5, 0), (0, -5, 0))
    assert hit["entity"] == ids[0]
    np.testing.assert_allclose(hit["fraction"], 0.4, atol=1e-4)
    np.testing.assert_allclose(hit["normal"], [0, 1, 0], atol=1e-4)


def test_ray_box():
    w, ids = _world_with([(et.BoxShape((0.5, 0.5, 0.5)), (2, 0, 0))])
    hit = w.raycast((-5, 0, 0), (5, 0, 0))
    assert hit["entity"] == ids[0]
    np.testing.assert_allclose(hit["fraction"], (1.5 + 5) / 10, atol=1e-4)
    np.testing.assert_allclose(hit["normal"], [-1, 0, 0], atol=1e-4)


def test_ray_plane_miss_parallel():
    w, ids = _world_with([(et.PlaneShape((0, 1, 0), 0.0), (0, 0, 0))])
    hit = w.raycast((0, 1, 0), (10, 1, 0))
    assert hit["entity"] == -1
    hit = w.raycast((0, 1, 0), (0, -1, 0))
    assert hit["entity"] == ids[0]
    np.testing.assert_allclose(hit["fraction"], 0.5, atol=1e-4)


def test_ray_capsule_and_cylinder():
    w, ids = _world_with([
        (et.CapsuleShape(0.5, 1.0), (0, 0, 0)),       # axis X
        (et.CylinderShape(0.5, 1.0, 1), (5, 0, 0)),   # axis Y
    ])
    # hit capsule side from above
    hit = w.raycast((0, 3, 0), (0, -3, 0))
    assert hit["entity"] == ids[0]
    np.testing.assert_allclose(hit["fraction"], 2.5 / 6, atol=1e-3)
    # hit capsule hemisphere cap
    hit = w.raycast((3, 0, 0), (-3, 0, 0))
    assert hit["entity"] == ids[0]
    np.testing.assert_allclose(hit["fraction"], 1.5 / 6, atol=1e-3)
    # hit cylinder cap disk from above
    hit = w.raycast((5, 3, 0), (5, -3, 0))
    assert hit["entity"] == ids[1]
    np.testing.assert_allclose(hit["fraction"], 2.0 / 6, atol=1e-3)
    np.testing.assert_allclose(hit["normal"], [0, 1, 0], atol=1e-3)


def test_ray_polyhedron():
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], np.float32)  # octahedron
    w, ids = _world_with([(et.PolyhedronShape(verts), (0, 0, 0))])
    hit = w.raycast((0, 5, 0), (0, -5, 0))
    assert hit["entity"] == ids[0]
    np.testing.assert_allclose(hit["fraction"], 0.4, atol=1e-3)


def test_ray_feature_info():
    """Per-shape feature detail (reference shape_raycast_result info
    variants, raycast.hpp:33-120)."""
    from edyn_tpu.collision.raycast import (
        FEAT_FACE, FEAT_HEMISPHERE, FEAT_SIDE, FEAT_TRIANGLE)
    w, ids = _world_with([
        (et.BoxShape((0.5, 0.5, 0.5)), (0, 0, 0)),
        (et.CapsuleShape(0.5, 1.0), (5, 0, 0)),       # axis X
        (et.CylinderShape(0.5, 1.0, 1), (10, 0, 0)),  # axis Y
    ])
    # box -x face (face index = axis*2 + negative = 1)
    hit = w.raycast((-3, 0, 0), (0, 0, 0))
    assert hit["feature"] == FEAT_FACE and hit["sub_index"] == 1
    # box +y face (index 2)
    hit = w.raycast((0, 3, 0), (0, -3, 0))
    assert hit["feature"] == FEAT_FACE and hit["sub_index"] == 2
    # capsule side vs -x hemisphere (index 1)
    hit = w.raycast((5, 3, 0), (5, -3, 0))
    assert hit["feature"] == FEAT_SIDE
    hit = w.raycast((2, 0, 0), (8, 0, 0))
    assert hit["feature"] == FEAT_HEMISPHERE and hit["sub_index"] == 1
    # cylinder +axis cap disc (face 0) vs curved side
    hit = w.raycast((10, 3, 0), (10, -3, 0))
    assert hit["feature"] == FEAT_FACE and hit["sub_index"] == 0
    hit = w.raycast((7, 0, 0), (13, 0, 0))
    assert hit["feature"] == FEAT_SIDE
    assert hit["child_index"] == -1


def test_ray_mesh_triangle_and_compound_child():
    from edyn_tpu.collision.raycast import FEAT_TRIANGLE
    tri_v = np.array([[0, 0, 0], [4, 0, 0], [0, 0, 4],
                      [4, 0, 4]], np.float32)
    tris = np.array([[0, 2, 1], [1, 2, 3]], np.int32)  # +y winding
    b = et.WorldBuilder()
    mesh_id = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.MeshShape(tri_v, tris)))
    comp = et.CompoundShape(children=[
        (et.SphereShape(0.5), (0, 0, 0), (0, 0, 0, 1)),
        (et.BoxShape((0.3, 0.3, 0.3)), (2.0, 0, 0), (0, 0, 0, 1)),
    ])
    comp_id = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=comp, position=(10, 2, 0)))
    w = et.make_world(b)
    w.step(1)
    # hits triangle 1 (x+z > 4 half of the quad)
    hit = w.raycast((3, 2, 3), (3, -2, 3))
    assert hit["entity"] == mesh_id
    assert hit["feature"] == FEAT_TRIANGLE and hit["sub_index"] == 1
    # compound: ray down onto the box child (child 1)
    hit = w.raycast((12, 5, 0), (12, -1, 0))
    assert hit["entity"] == comp_id
    assert hit["child_index"] == 1


def test_ray_nearest_of_many():
    w, ids = _world_with([
        (et.SphereShape(0.5), (0, 0, 0)),
        (et.SphereShape(0.5), (2, 0, 0)),
        (et.SphereShape(0.5), (4, 0, 0)),
    ])
    hit = w.raycast((-5, 0, 0), (10, 0, 0))
    assert hit["entity"] == ids[0]
    # batch form
    out = w.raycast([(-5, 0, 0), (10, 0, 0)], [(10, 0, 0), (-5, 0, 0)])
    assert out["entity"][0] == ids[0]
    assert out["entity"][1] == ids[2]
