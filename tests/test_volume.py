"""Shape volume + mesh centroid (mirrors reference
test/edyn/shapes/test_shape_volume.cpp and test_centroid.cpp)."""
import math

import numpy as np

import edyn_tpu as et
from edyn_tpu.shapes.volume import mesh_centroid, mesh_volume, shape_volume


def _unit_box_cloud(h=0.5):
    return np.array([[sx * h, sy * h, sz * h]
                     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                    np.float64)


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    c, s = math.cos(angle), math.sin(angle)
    C = 1 - c
    return np.array([[c + x*x*C, x*y*C - z*s, x*z*C + y*s],
                     [y*x*C + z*s, c + y*y*C, y*z*C - x*s],
                     [z*x*C - y*s, z*y*C + x*s, c + z*z*C]])


def test_primitive_volumes():
    assert abs(shape_volume(et.SphereShape(0.7))
               - 4/3 * math.pi * 0.7**3) < 1e-9
    assert abs(shape_volume(et.BoxShape((0.5, 1.0, 2.0))) - 8.0) < 1e-9
    assert abs(shape_volume(et.CylinderShape(0.5, 1.5))
               - math.pi * 0.25 * 3.0) < 1e-9
    # capsule = cylinder + full sphere
    assert abs(shape_volume(et.CapsuleShape(0.5, 1.5))
               - (math.pi * 0.25 * 3.0 + 4/3 * math.pi * 0.125)) < 1e-9


def test_polyhedron_volume_invariances():
    """Reference: test_shape_volume.cpp polyhedron_volume — unit box cloud has
    volume 1, invariant under rotation and translation, scales cubically."""
    v = _unit_box_cloud()
    assert abs(shape_volume(et.PolyhedronShape(v)) - 1.0) < 1e-9

    R = _rot((3, 8, -1), math.pi * 1.34)
    vr = v @ R.T
    assert abs(shape_volume(et.PolyhedronShape(vr)) - 1.0) < 1e-5
    vt = vr + np.array([10.0, -12.0, 20.889])
    assert abs(shape_volume(et.PolyhedronShape(vt)) - 1.0) < 1e-5
    assert abs(shape_volume(et.PolyhedronShape(vt * 2.0)) - 8.0) < 1e-4


def test_compound_volume_sums_children():
    comp = et.CompoundShape(children=[
        (et.BoxShape((0.5, 0.5, 0.5)), (0, 0, 0), (0, 0, 0, 1)),
        (et.SphereShape(1.0), (0, 2, 0), (0, 0, 0, 1)),
    ])
    assert abs(shape_volume(comp) - (1.0 + 4/3 * math.pi)) < 1e-9


def test_mesh_centroid():
    """Reference: test_centroid.cpp — centroid of a box mesh is its center,
    invariant under rotation, and follows translation."""
    from edyn_tpu.shapes.params import _convex_hull
    v = _unit_box_cloud()
    f = _convex_hull(v)
    np.testing.assert_allclose(mesh_centroid(v, f), 0.0, atol=1e-12)

    R = _rot((-2, 0.22, 7), math.pi * 2.71)
    vr = v @ R.T
    fr = _convex_hull(vr)
    np.testing.assert_allclose(mesh_centroid(vr, fr), 0.0, atol=1e-4)

    pos = np.array([-9.8, 1.85, 12.13])
    np.testing.assert_allclose(mesh_centroid(vr + pos, fr), pos, atol=1e-4)
    # volume is translation-invariant for the closed surface
    assert abs(mesh_volume(vr + pos, fr) - 1.0) < 1e-5
