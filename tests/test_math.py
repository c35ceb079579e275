"""Math layer goldens (mirrors reference test/edyn/math/test_vector3.cpp,
test_matrix3x3.cpp, test_geom.cpp)."""
import numpy as np
import jax.numpy as jnp

from edyn_tpu.math import geom, quat, vec


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = quat.normalize(jnp.asarray(rng.normal(size=(32, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    r1 = quat.rotate(q, v)
    r2 = jnp.einsum("kij,kj->ki", quat.to_matrix(q), v)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_quat_mul_axis_angle():
    qx = quat.from_axis_angle(jnp.array([1.0, 0, 0]), jnp.pi / 2)
    v = jnp.array([0.0, 1.0, 0.0])
    out = quat.rotate(qx, v)
    np.testing.assert_allclose(out, [0, 0, 1], atol=1e-6)


def test_quat_integrate_small_vs_finite():
    q = quat.identity((4,))
    w = jnp.array([[0.0, 1.0, 0.0]] * 4)
    q2 = quat.integrate(q, w, 0.5)
    # rotating around y by 0.5 rad
    expect = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.5)
    np.testing.assert_allclose(q2[0], expect, atol=1e-5)


def test_quat_rotate_inverse_roundtrip():
    rng = np.random.default_rng(1)
    q = quat.normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    np.testing.assert_allclose(quat.rotate_inv(q, quat.rotate(q, v)), v, atol=1e-5)


def test_closest_point_segment():
    a = jnp.array([[0.0, 0, 0]])
    b = jnp.array([[1.0, 0, 0]])
    p = jnp.array([[0.5, 1.0, 0]])
    t, c, d2 = geom.closest_point_segment(a, b, p)
    np.testing.assert_allclose(t, [0.5], atol=1e-6)
    np.testing.assert_allclose(d2, [1.0], atol=1e-6)


def test_closest_point_segment_segment_crossing():
    p1 = jnp.array([[-1.0, 0, 0]])
    q1 = jnp.array([[1.0, 0, 0]])
    p2 = jnp.array([[0.0, 1.0, -1.0]])
    q2 = jnp.array([[0.0, 1.0, 1.0]])
    s, t, c1, c2, d2 = geom.closest_point_segment_segment(p1, q1, p2, q2)
    np.testing.assert_allclose(c1, [[0, 0, 0]], atol=1e-6)
    np.testing.assert_allclose(c2, [[0, 1, 0]], atol=1e-6)
    np.testing.assert_allclose(d2, [1.0], atol=1e-6)


def test_closest_point_segment_segment_degenerate():
    # second segment collapsed to a point: s must be clamp(-c/a) (Ericson's
    # degenerate branch), t = 0
    p1 = jnp.array([[0.0, 0, 0]])
    q1 = jnp.array([[2.0, 0, 0]])
    pt = jnp.array([[0.5, 1.0, 0]])
    s, t, c1, c2, d2 = geom.closest_point_segment_segment(p1, q1, pt, pt)
    np.testing.assert_allclose(s, [0.25], atol=1e-6)
    np.testing.assert_allclose(t, [0.0], atol=1e-6)
    np.testing.assert_allclose(c1, [[0.5, 0, 0]], atol=1e-6)
    np.testing.assert_allclose(d2, [1.0], atol=1e-6)
    # first segment collapsed
    s, t, c1, c2, d2 = geom.closest_point_segment_segment(pt, pt, p1, q1)
    np.testing.assert_allclose(t, [0.25], atol=1e-6)
    np.testing.assert_allclose(s, [0.0], atol=1e-6)
    np.testing.assert_allclose(d2, [1.0], atol=1e-6)
    # both collapsed
    s, t, c1, c2, d2 = geom.closest_point_segment_segment(pt, pt, p1, p1)
    np.testing.assert_allclose([float(s[0]), float(t[0])], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(d2, [1.25], atol=1e-6)
    # point clamped past the end of the segment
    far = jnp.array([[5.0, 1.0, 0]])
    s, t, c1, c2, d2 = geom.closest_point_segment_segment(p1, q1, far, far)
    np.testing.assert_allclose(s, [1.0], atol=1e-6)
    np.testing.assert_allclose(d2, [10.0], atol=1e-6)


def test_closest_point_triangle_regions():
    a = jnp.array([[0.0, 0, 0]])
    b = jnp.array([[1.0, 0, 0]])
    c = jnp.array([[0.0, 0, 1.0]])
    # above the face
    q, d2, reg = geom.closest_point_triangle(a, b, c, jnp.array([[0.2, 1.0, 0.2]]))
    np.testing.assert_allclose(q, [[0.2, 0, 0.2]], atol=1e-6)
    assert int(reg[0]) == 0
    # nearest vertex a
    q, d2, reg = geom.closest_point_triangle(a, b, c, jnp.array([[-1.0, 0.0, -1.0]]))
    np.testing.assert_allclose(q, [[0, 0, 0]], atol=1e-6)


def test_orthonormal_basis():
    rng = np.random.default_rng(2)
    n = vec.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    t1, t2 = vec.orthonormal_basis(n)
    np.testing.assert_allclose(vec.dot(t1, n), 0, atol=1e-5)
    np.testing.assert_allclose(vec.dot(t2, n), 0, atol=1e-5)
    np.testing.assert_allclose(vec.dot(t1, t2), 0, atol=1e-5)
    np.testing.assert_allclose(vec.length(t1), 1, atol=1e-5)


def test_ray_primitives():
    t = geom.intersect_ray_sphere(jnp.array([[0.0, 2, 0]]), jnp.array([[0.0, -1, 0]]),
                                  jnp.array([[0.0, 0, 0]]), jnp.array([1.0]))
    np.testing.assert_allclose(t, [1.0], atol=1e-5)
    t = geom.intersect_ray_plane(jnp.array([[0.0, 2, 0]]), jnp.array([[0.0, -1, 0]]),
                                 jnp.array([[0.0, 1, 0]]), jnp.array([0.0]))
    np.testing.assert_allclose(t, [2.0], atol=1e-5)
