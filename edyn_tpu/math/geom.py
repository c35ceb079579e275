"""Closest-point / intersection geometry primitives, batched & branchless.

TPU-native counterpart of the reference's geometry kitchen sink
(include/edyn/math/geom.hpp:1-437, src/edyn/math/geom.cpp:1-1354). The
branchy scalar routines are reformulated as masked vector math so they can
run under vmap/jit over entire contact-pair batches.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import vec

EPS = 1e-10


def closest_point_segment(a, b, p):
    """Closest point on segment [a,b] to point p.

    Returns (t, c, dist_sqr) (reference: include/edyn/math/geom.hpp:33
    closest_point_segment).
    """
    ab = b - a
    t = vec.dot(p - a, ab) / jnp.maximum(vec.length_sqr(ab), EPS)
    t = jnp.clip(t, 0.0, 1.0)
    c = a + ab * t[..., None]
    return t, c, vec.length_sqr(p - c)


def closest_point_line(a, d, p):
    """Closest point on infinite line a + t*d to p; returns (t, c, dist_sqr)."""
    t = vec.dot(p - a, d) / jnp.maximum(vec.length_sqr(d), EPS)
    c = a + d * t[..., None]
    return t, c, vec.length_sqr(p - c)


def closest_point_segment_segment(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2].

    Branchless version of Ericson RTCD 5.1.9 (reference:
    include/edyn/math/geom.hpp:100 closest_point_segment_segment).
    Returns (s, t, c1, c2, dist_sqr).
    """
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = vec.length_sqr(d1)
    e = vec.length_sqr(d2)
    f = vec.dot(d2, r)
    c = vec.dot(d1, r)
    b = vec.dot(d1, d2)
    denom = a * e - b * b

    # General (non-parallel) tentative s; 0 when parallel/degenerate.
    s = jnp.where(denom > EPS, jnp.clip((b * f - c * e) / jnp.maximum(denom, EPS), 0.0, 1.0), 0.0)
    # Degenerate segments handled by the maximum() guards below.
    t = (b * s + f) / jnp.maximum(e, EPS)
    # Re-clamp: if t out of [0,1], clamp t then recompute s.
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(t != t_cl, jnp.clip((t_cl * b - c) / jnp.maximum(a, EPS), 0.0, 1.0), s)
    t = t_cl
    # Degenerate guards (Ericson 5.1.9 degenerate branches):
    # second segment is a point -> t = 0, s = clamp(-c/a)
    s = jnp.where(e <= EPS, jnp.clip(-c / jnp.maximum(a, EPS), 0.0, 1.0), s)
    t = jnp.where(e <= EPS, 0.0, t)
    # first segment is a point -> s = 0, t = clamp(f/e)
    t = jnp.where(a <= EPS, jnp.clip(f / jnp.maximum(e, EPS), 0.0, 1.0), t)
    s = jnp.where(a <= EPS, 0.0, s)
    # both points -> s = t = 0
    t = jnp.where((a <= EPS) & (e <= EPS), 0.0, t)
    c1 = p1 + d1 * s[..., None]
    c2 = p2 + d2 * t[..., None]
    return s, t, c1, c2, vec.length_sqr(c1 - c2)


def closest_point_plane(p, n, c):
    """Distance & projection of p onto plane with unit normal n and constant c
    (n·x = c). Returns (dist, proj)."""
    dist = vec.dot(p, n) - c
    return dist, p - n * dist[..., None]


def distance_aabb(p, aabb_min, aabb_max):
    """Distance from point to AABB (0 inside)."""
    d = jnp.maximum(jnp.maximum(aabb_min - p, p - aabb_max), 0.0)
    return vec.length(d)


def barycentric_triangle(a, b, c, p):
    """Barycentric coordinates of p wrt triangle abc
    (reference: include/edyn/math/triangle.hpp)."""
    v0 = b - a
    v1 = c - a
    v2 = p - a
    d00 = vec.dot(v0, v0)
    d01 = vec.dot(v0, v1)
    d11 = vec.dot(v1, v1)
    d20 = vec.dot(v2, v0)
    d21 = vec.dot(v2, v1)
    denom = jnp.maximum(d00 * d11 - d01 * d01, EPS)
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    u = 1.0 - v - w
    return jnp.stack([u, v, w], axis=-1)


def closest_point_triangle(a, b, c, p):
    """Closest point on triangle abc to p (Ericson 5.1.5, branchless).

    Returns (q, dist_sqr, region) where region encodes the feature:
    0=face, 1/2/3=vertex a/b/c, 4/5/6=edge ab/bc/ca.
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = vec.dot(ab, ap)
    d2 = vec.dot(ac, ap)
    bp = p - b
    d3 = vec.dot(ab, bp)
    d4 = vec.dot(ac, bp)
    cp = p - c
    d5 = vec.dot(ab, cp)
    d6 = vec.dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # Region tests (mutually exclusive by construction order).
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (~in_a) & (~in_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (~in_a) & (~in_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (~in_b) & (~in_c) & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) > EPS, d1 - d3, 1.0)
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) > EPS, d2 - d6, 1.0)
    w_bc = (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) > EPS, (d4 - d3) + (d5 - d6), 1.0)

    denom = 1.0 / jnp.maximum(va + vb + vc, EPS)
    v = vb * denom
    w = vc * denom
    q_face = a + ab * v[..., None] + ac * w[..., None]

    q = q_face
    q = jnp.where(on_bc[..., None], b + (c - b) * w_bc[..., None], q)
    q = jnp.where(on_ac[..., None], a + ac * w_ac[..., None], q)
    q = jnp.where(on_ab[..., None], a + ab * v_ab[..., None], q)
    q = jnp.where(in_c[..., None], c, q)
    q = jnp.where(in_b[..., None], b, q)
    q = jnp.where(in_a[..., None], a, q)

    region = jnp.zeros(jnp.shape(d1), dtype=jnp.int32)
    region = jnp.where(on_bc, 5, region)
    region = jnp.where(on_ac, 6, region)
    region = jnp.where(on_ab, 4, region)
    region = jnp.where(in_c, 3, region)
    region = jnp.where(in_b, 2, region)
    region = jnp.where(in_a, 1, region)
    return q, vec.length_sqr(p - q), region


# --- ray intersection primitives (raycast; reference src/edyn/collision/raycast.cpp) ---

BIG = 1e30


def intersect_ray_plane(p0, d, n, c):
    """Ray p0 + t*d vs plane n·x = c. Returns t (BIG when parallel/behind)."""
    denom = vec.dot(d, n)
    t = (c - vec.dot(p0, n)) / jnp.where(jnp.abs(denom) > EPS, denom, 1.0)
    hit = (jnp.abs(denom) > EPS) & (t >= 0.0)
    return jnp.where(hit, t, BIG)


def intersect_ray_sphere(p0, d, center, radius):
    """Returns smallest t >= 0 or BIG."""
    m = p0 - center
    a = vec.length_sqr(d)
    b = vec.dot(m, d)
    c = vec.length_sqr(m) - radius * radius
    disc = b * b - a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / jnp.maximum(a, EPS)
    t1 = (-b + sq) / jnp.maximum(a, EPS)
    t = jnp.where(t0 >= 0.0, t0, t1)
    return jnp.where(ok & (t >= 0.0), t, BIG)


def intersect_ray_aabb(p0, d, amin, amax):
    """Slab test; returns (t_enter, t_exit); miss when t_enter > t_exit."""
    inv = 1.0 / jnp.where(jnp.abs(d) > EPS, d, jnp.where(d >= 0, EPS, -EPS))
    t0 = (amin - p0) * inv
    t1 = (amax - p0) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return jnp.maximum(tmin, 0.0), tmax


def intersect_segment_triangle(p0, d, a, b, c):
    """Moller-Trumbore; returns (t, hit) for ray p0+t*d vs triangle
    (reference: include/edyn/math/geom.hpp:411 intersect_segment_triangle)."""
    e1 = b - a
    e2 = c - a
    h = vec.cross(d, e2)
    det = vec.dot(e1, h)
    ok = jnp.abs(det) > EPS
    inv = 1.0 / jnp.where(ok, det, 1.0)
    s = p0 - a
    u = vec.dot(s, h) * inv
    q = vec.cross(s, e1)
    v = vec.dot(d, q) * inv
    t = vec.dot(e2, q) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0)
    return jnp.where(hit, t, BIG), hit
