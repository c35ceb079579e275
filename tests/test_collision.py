"""Narrowphase kernel goldens with analytically placed shapes (mirrors
reference test/edyn/collision/test_collision.cpp: exact contact counts and
pivot positions per configuration)."""
import numpy as np
import jax.numpy as jnp

from edyn_tpu.collision.kernels import box_box, primitives
from edyn_tpu.math import quat

THRESH = 0.01
IDENT = jnp.array([[0.0, 0.0, 0.0, 1.0]])
ZERO = jnp.array([[0.0, 0.0, 0.0]])


def _params(*vals):
    p = np.zeros((1, 4), np.float32)
    p[0, :len(vals)] = vals
    return jnp.asarray(p)


def _valid_points(res):
    pv = np.asarray(res.point_valid[0])
    return [i for i in range(4) if pv[i]]


def test_sphere_sphere_touching():
    res = primitives.collide_sphere_sphere(
        jnp.array([[0.0, 2.001, 0.0]]), IDENT, _params(1.0),
        ZERO, IDENT, _params(1.0), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 1
    d = float(res.distance[0, 0])
    assert abs(d - 0.001) < 1e-5
    np.testing.assert_allclose(np.asarray(res.normal[0, 0]), [0, 1, 0], atol=1e-6)


def test_sphere_sphere_separated_beyond_threshold():
    res = primitives.collide_sphere_sphere(
        jnp.array([[0.0, 2.5, 0.0]]), IDENT, _params(1.0),
        ZERO, IDENT, _params(1.0), THRESH)
    assert len(_valid_points(res)) == 0


def test_sphere_plane():
    res = primitives.collide_sphere_plane(
        jnp.array([[0.0, 0.95, 0.0]]), IDENT, _params(1.0),
        ZERO, IDENT, _params(0.0, 1.0, 0.0, 0.0), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 1
    assert abs(float(res.distance[0, 0]) + 0.05) < 1e-6
    # pivot on sphere surface, object space
    np.testing.assert_allclose(np.asarray(res.pivot_a[0, 0]), [0, -1, 0], atol=1e-5)


def test_box_plane_face_contact_four_points():
    """Box resting flat on plane -> 4 corner contacts (reference
    test_collision.cpp box-box face-face expects 4 pivots)."""
    res = primitives.collide_box_plane(
        jnp.array([[0.0, 0.5, 0.0]]), IDENT, _params(0.5, 0.5, 0.5),
        ZERO, IDENT, _params(0.0, 1.0, 0.0, 0.0), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 4
    pivots = np.asarray(res.pivot_a[0])[pts]
    # all four bottom corners
    assert np.allclose(np.abs(pivots), 0.5, atol=1e-5)
    assert np.allclose(pivots[:, 1], -0.5, atol=1e-5)
    assert np.allclose(np.asarray(res.distance[0])[pts], 0.0, atol=1e-5)


def test_box_plane_edge_tilt():
    """Box tilted 45 deg about z -> bottom edge contact (2 points)."""
    orn = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi / 4)[None]
    h = np.sqrt(2) * 0.5
    res = primitives.collide_box_plane(
        jnp.array([[0.0, h, 0.0]]), orn, _params(0.5, 0.5, 0.5),
        ZERO, IDENT, _params(0.0, 1.0, 0.0, 0.0), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 2
    world = np.asarray(res.pivot_a[0])[pts]
    # the contact edge is the box edge along z at local (+-0.5,-0.5) rotated down
    assert set(np.round(world[:, 2], 3)) == {0.5, -0.5}


def test_box_box_face_face():
    """Stacked boxes -> 4-point manifold with correct separation
    (reference: test_collision.cpp:13-43)."""
    res = box_box.collide_box_box(
        jnp.array([[0.0, 1.0005, 0.0]]), IDENT, _params(0.5, 0.5, 0.5),
        ZERO, IDENT, _params(0.5, 0.5, 0.5), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 4
    np.testing.assert_allclose(np.asarray(res.normal[0])[pts], [[0, 1, 0]] * 4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.distance[0])[pts], 0.0005, atol=1e-4)
    piv = np.asarray(res.pivot_a[0])[pts]
    assert np.allclose(np.abs(piv[:, [0, 2]]), 0.5, atol=1e-4)
    assert np.allclose(piv[:, 1], -0.5, atol=1e-4)


def test_box_box_face_face_offset_clip():
    """Top box shifted by half a width -> clipped 4-point manifold spanning
    the overlap region."""
    res = box_box.collide_box_box(
        jnp.array([[0.5, 1.0, 0.0]]), IDENT, _params(0.5, 0.5, 0.5),
        ZERO, IDENT, _params(0.5, 0.5, 0.5), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 4
    pa_world = np.asarray(res.pivot_a[0])[pts] + [0.5, 1.0, 0.0]
    assert pa_world[:, 0].min() > -0.01 and pa_world[:, 0].max() < 1.01


def test_box_box_edge_edge():
    """Two boxes crossed at 45deg meeting on edges -> single point."""
    orn_a = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi / 4)[None]
    orn_b = quat.from_axis_angle(jnp.array([1.0, 0.0, 0.0]), np.pi / 4)[None]
    ha = np.sqrt(2) * 0.5
    res = box_box.collide_box_box(
        jnp.array([[0.0, 2 * ha - 0.001, 0.0]]), orn_a, _params(0.5, 0.5, 0.5),
        ZERO, orn_b, _params(0.5, 0.5, 0.5), THRESH)
    pts = _valid_points(res)
    assert len(pts) >= 1
    assert float(res.distance[0, pts[0]]) < 0.0


def test_sphere_box_face():
    res = primitives.collide_sphere_box(
        jnp.array([[0.0, 1.45, 0.0]]), IDENT, _params(1.0),
        ZERO, IDENT, _params(0.5, 0.5, 0.5), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 1
    assert abs(float(res.distance[0, 0]) + 0.05) < 1e-5
    np.testing.assert_allclose(np.asarray(res.normal[0, 0]), [0, 1, 0], atol=1e-5)


def test_sphere_box_deep_center():
    """Sphere center inside the box -> min-penetration face normal."""
    res = primitives.collide_sphere_box(
        jnp.array([[0.0, 0.4, 0.0]]), IDENT, _params(0.25),
        ZERO, IDENT, _params(0.5, 0.5, 0.5), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 1
    np.testing.assert_allclose(np.asarray(res.normal[0, 0]), [0, 1, 0], atol=1e-5)
    assert float(res.distance[0, 0]) < -0.3


def test_capsule_plane_lying():
    res = primitives.collide_capsule_plane(
        jnp.array([[0.0, 0.25, 0.0]]), IDENT, _params(0.3, 0.5, 0.0),
        ZERO, IDENT, _params(0.0, 1.0, 0.0, 0.0), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 2
    np.testing.assert_allclose(np.asarray(res.distance[0])[pts], -0.05, atol=1e-5)


def test_capsule_capsule_parallel_two_points():
    res = primitives.collide_capsule_capsule(
        jnp.array([[0.0, 0.59, 0.0]]), IDENT, _params(0.3, 0.5, 0.0),
        ZERO, IDENT, _params(0.3, 0.5, 0.0), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 2
    np.testing.assert_allclose(np.asarray(res.distance[0])[pts], -0.01, atol=1e-4)


def test_cylinder_plane_flat_cap():
    """Cylinder standing on its cap (axis Y) -> 4 rim points."""
    res = primitives.collide_cylinder_plane(
        jnp.array([[0.0, 0.495, 0.0]]), IDENT, _params(0.3, 0.5, 1.0),
        ZERO, IDENT, _params(0.0, 1.0, 0.0, 0.0), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 4
    np.testing.assert_allclose(np.asarray(res.distance[0])[pts], -0.005, atol=1e-4)


def test_cylinder_plane_side_lying():
    """Cylinder lying on its side (axis X) -> 2 contact points along the line."""
    res = primitives.collide_cylinder_plane(
        jnp.array([[0.0, 0.295, 0.0]]), IDENT, _params(0.3, 0.5, 0.0),
        ZERO, IDENT, _params(0.0, 1.0, 0.0, 0.0), THRESH)
    pts = _valid_points(res)
    assert len(pts) == 2
    d = np.asarray(res.distance[0])[pts]
    np.testing.assert_allclose(d, -0.005, atol=1e-4)
