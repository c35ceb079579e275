"""Moments of inertia per shape (reference:
include/edyn/dynamics/moment_of_inertia.hpp:12-53,
src/edyn/dynamics/moment_of_inertia.cpp). Host-side (numpy), used at body
creation time like the reference's make_rigidbody."""
from __future__ import annotations

import numpy as np

from .params import ShapeType


def _axis_perm(axis: int):
    """Returns index order placing the shape axis first."""
    others = [i for i in range(3) if i != axis]
    return [axis] + others


def moment_of_inertia(shape_type: int, params, mass: float) -> np.ndarray:
    """Diagonal local inertia tensor [3] (full tensor for polyhedra is handled
    by the builder via the covariance method)."""
    p = np.asarray(params, np.float64)
    if shape_type == ShapeType.SPHERE:
        s = 2.0 / 5.0 * mass * p[0] ** 2
        return np.array([s, s, s])
    if shape_type == ShapeType.BOX:
        e = 2.0 * p[:3]  # full extents
        return mass / 12.0 * np.array([
            e[1] ** 2 + e[2] ** 2,
            e[0] ** 2 + e[2] ** 2,
            e[0] ** 2 + e[1] ** 2,
        ])
    if shape_type == ShapeType.CYLINDER:
        r, hl, axis = p[0], p[1], int(p[2])
        L = 2 * hl
        i_axis = 0.5 * mass * r * r
        i_perp = mass / 12.0 * (3 * r * r + L * L)
        out = np.array([i_perp, i_perp, i_perp])
        out[axis] = i_axis
        return out
    if shape_type == ShapeType.CAPSULE:
        # cylinder + two hemispheres (reference moment_of_inertia_capsule)
        r, hl, axis = p[0], p[1], int(p[2])
        L = 2 * hl
        m_cyl = mass * L / (L + 4.0 / 3.0 * r) if (L + 4.0 / 3.0 * r) > 0 else 0.0
        m_hemi = (mass - m_cyl) / 2.0
        i_axis = 0.5 * m_cyl * r * r + 2 * m_hemi * (2.0 / 5.0 * r * r)
        i_perp = (m_cyl * (L * L / 12.0 + r * r / 4.0)
                  + 2 * m_hemi * (2.0 / 5.0 * r * r + hl * hl + 3.0 / 8.0 * r * L))
        out = np.array([i_perp, i_perp, i_perp])
        out[axis] = i_axis
        return out
    # plane / mesh are static; amorphous gets point inertia
    return np.array([mass, mass, mass]) * 0.0 + mass * 1e-3


def polyhedron_inertia(vertices: np.ndarray, mass: float) -> np.ndarray:
    """Full 3x3 inertia tensor of a convex polyhedron about its centroid using
    the tetrahedron-decomposition covariance method (reference:
    moment_of_inertia_polyhedron, src/edyn/dynamics/moment_of_inertia.cpp)."""
    from .params import _convex_hull
    verts = np.asarray(vertices, np.float64)
    faces = _convex_hull(verts)
    C_canon = np.array([[1 / 60, 1 / 120, 1 / 120],
                        [1 / 120, 1 / 60, 1 / 120],
                        [1 / 120, 1 / 120, 1 / 60]])
    C = np.zeros((3, 3))
    vol = 0.0
    centroid = np.zeros(3)
    for f in faces:
        a, b, c = verts[f[0]], verts[f[1]], verts[f[2]]
        A = np.stack([a, b, c], axis=1)  # columns
        detA = np.linalg.det(A)
        C += detA * A @ C_canon @ A.T
        vol += detA / 6.0
        centroid += detA / 24.0 * (a + b + c)
    if vol <= 0:
        return np.eye(3) * mass * 1e-3
    centroid /= vol
    density = mass / vol
    C *= density
    # shift to centroid
    m = mass
    C -= m * np.outer(centroid, centroid)
    I = np.eye(3) * np.trace(C) - C
    return I
