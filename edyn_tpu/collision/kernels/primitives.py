"""Narrowphase kernels for primitive shape pairs.

Batched, branchless counterparts of the reference's per-pair collide()
translation units (src/edyn/collision/collide/collide_sphere_sphere.cpp,
collide_sphere_plane.cpp, collide_box_plane.cpp, collide_capsule_plane.cpp,
collide_cylinder_plane.cpp, collide_sphere_box.cpp, collide_capsule_capsule.cpp,
collide_capsule_sphere.cpp). Each operates on K gathered pairs at once.

Convention: body A is the first (non-plane) shape; planes are always body B.
Normals point from B toward A.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import geom, quat, vec
from .common import (
    ATTACH_A, ATTACH_B, ATTACH_NONE, ContactResult, axis_onehot, gather_points,
    make_result, reduce_to_4,
)


def _plane_world(pos_b, orn_b, params_b):
    """World-space unit normal and constant of a plane shape attached to body B
    (plane params are object-space: include/edyn/shapes/plane_shape.hpp)."""
    n = quat.rotate(orn_b, params_b[:, :3])
    c = params_b[:, 3] + vec.dot(n, pos_b)
    return n, c


def _single_point(pos_a, orn_a, pos_b, orn_b, pa_w, pb_w, normal, dist, valid,
                  attachment, threshold):
    """Wrap a one-point-per-pair result into the 4-slot ContactResult."""
    K = pos_a.shape[0]
    pad = lambda x: jnp.concatenate([x[:, None], jnp.zeros_like(x[:, None]).repeat(3, 1)], 1)
    point_valid = jnp.zeros((K, 4), bool).at[:, 0].set(valid)
    return make_result(
        pos_a, orn_a, pos_b, orn_b,
        pad(pa_w), pad(pb_w),
        pad(normal),
        jnp.zeros((K, 4)).at[:, 0].set(dist),
        point_valid,
        jnp.full((K, 4), attachment, jnp.int32),
        threshold,
    )


# ---------------------------------------------------------------------------

def collide_sphere_sphere(pos_a, orn_a, params_a, pos_b, orn_b, params_b,
                          threshold):
    """reference: src/edyn/collision/collide/collide_sphere_sphere.cpp"""
    ra = params_a[:, 0]
    rb = params_b[:, 0]
    d = pos_a - pos_b
    dist_c = vec.length(d)
    n = vec.normalize_or(d, jnp.array([0.0, 1.0, 0.0]))
    dist = dist_c - ra - rb
    pa_w = pos_a - n * ra[:, None]
    pb_w = pos_b + n * rb[:, None]
    return _single_point(pos_a, orn_a, pos_b, orn_b, pa_w, pb_w, n, dist,
                         jnp.ones_like(dist, bool), ATTACH_NONE, threshold)


def collide_sphere_plane(pos_a, orn_a, params_a, pos_b, orn_b, params_b,
                         threshold):
    """reference: src/edyn/collision/collide/collide_sphere_plane.cpp"""
    r = params_a[:, 0]
    n, c = _plane_world(pos_b, orn_b, params_b)
    center_d = vec.dot(n, pos_a) - c
    dist = center_d - r
    pa_w = pos_a - n * r[:, None]
    pb_w = pos_a - n * center_d[:, None]
    return _single_point(pos_a, orn_a, pos_b, orn_b, pa_w, pb_w, n, dist,
                         jnp.ones_like(dist, bool), ATTACH_B, threshold)


def collide_box_plane(pos_a, orn_a, params_a, pos_b, orn_b, params_b,
                      threshold):
    """Box vertices below the plane (reference:
    src/edyn/collision/collide/collide_box_plane.cpp). All 8 vertices are
    tested and reduced to the best 4 (the reference's support-feature walk
    becomes a masked reduction)."""
    h = params_a[:, :3]
    n, c = _plane_world(pos_b, orn_b, params_b)
    signs = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                       for sz in (-1, 1)], jnp.float32)        # [8,3]
    v_local = signs[None, :, :] * h[:, None, :]                # [K,8,3]
    v_world = pos_a[:, None, :] + quat.rotate(orn_a[:, None, :], v_local)
    dist = vec.dot(v_world, n[:, None, :]) - c[:, None]        # [K,8]
    cand_valid = dist < threshold
    idx, pv = reduce_to_4(v_world, dist, cand_valid)
    pa_w = gather_points(v_world, idx)
    d4 = gather_points(dist, idx)
    pb_w = pa_w - n[:, None, :] * d4[..., None]
    return make_result(pos_a, orn_a, pos_b, orn_b, pa_w, pb_w,
                       n[:, None, :], d4, pv,
                       jnp.full(d4.shape, ATTACH_B, jnp.int32), threshold)


def collide_capsule_plane(pos_a, orn_a, params_a, pos_b, orn_b, params_b,
                          threshold):
    """reference: src/edyn/collision/collide/collide_capsule_plane.cpp"""
    r = params_a[:, 0]
    hl = params_a[:, 1]
    axis_w = quat.rotate(orn_a, axis_onehot(params_a[:, 2]))
    n, c = _plane_world(pos_b, orn_b, params_b)
    ends = pos_a[:, None, :] + axis_w[:, None, :] * (
        jnp.array([1.0, -1.0])[None, :, None] * hl[:, None, None])  # [K,2,3]
    center_d = vec.dot(ends, n[:, None, :]) - c[:, None]
    dist = center_d - r[:, None]                                # [K,2]
    pa_w = ends - n[:, None, :] * r[:, None, None]
    pb_w = ends - n[:, None, :] * center_d[..., None]
    K = pos_a.shape[0]
    z = jnp.zeros((K, 2, 3))
    return make_result(
        pos_a, orn_a, pos_b, orn_b,
        jnp.concatenate([pa_w, z], 1), jnp.concatenate([pb_w, z], 1),
        n[:, None, :],
        jnp.concatenate([dist, jnp.zeros((K, 2))], 1),
        jnp.concatenate([jnp.ones((K, 2), bool), jnp.zeros((K, 2), bool)], 1),
        jnp.full((K, 4), ATTACH_B, jnp.int32),
        threshold,
    )


def collide_cylinder_plane(pos_a, orn_a, params_a, pos_b, orn_b, params_b,
                           threshold):
    """Cylinder cap-rim sampling vs plane (reference:
    src/edyn/collision/collide/collide_cylinder_plane.cpp). The reference
    classifies cap-face / cap-edge / side features; here each cap rim
    contributes 4 sample points (deepest radial direction and its rotations),
    which covers flat cap rest (4 coplanar deepest), tilted edge contact
    (single deepest rim point) and side-lying contact (deepest point per cap)
    under the reduce-to-4 masked reduction."""
    r = params_a[:, 0]
    hl = params_a[:, 1]
    axis_w = quat.rotate(orn_a, axis_onehot(params_a[:, 2]))
    n, c = _plane_world(pos_b, orn_b, params_b)
    # deepest radial direction on the cap plane (pointing into the plane)
    t1, t2 = vec.orthonormal_basis(axis_w)
    radial = -(n - axis_w * vec.dot(n, axis_w)[:, None])
    d0 = vec.normalize_or(radial, t1)
    d90 = vec.cross(axis_w, d0)
    caps = pos_a[:, None, :] + axis_w[:, None, :] * (
        jnp.array([1.0, -1.0])[None, :, None] * hl[:, None, None])  # [K,2,3]
    dirs = jnp.stack([d0, d90, -d0, -d90], axis=1)                   # [K,4,3]
    pts = caps[:, :, None, :] + dirs[:, None, :, :] * r[:, None, None, None]
    pts = pts.reshape(pts.shape[0], 8, 3)                            # [K,8,3]
    dist = vec.dot(pts, n[:, None, :]) - c[:, None]
    idx, pv = reduce_to_4(pts, dist, dist < threshold)
    pa_w = gather_points(pts, idx)
    d4 = gather_points(dist, idx)
    pb_w = pa_w - n[:, None, :] * d4[..., None]
    return make_result(pos_a, orn_a, pos_b, orn_b, pa_w, pb_w,
                       n[:, None, :], d4, pv,
                       jnp.full(d4.shape, ATTACH_B, jnp.int32), threshold)


def collide_sphere_box(pos_a, orn_a, params_a, pos_b, orn_b, params_b,
                       threshold):
    """Sphere A vs box B via closest point in box space (reference:
    src/edyn/collision/collide/collide_sphere_box.cpp). The inside-the-box
    deep case picks the minimum-penetration face, masked."""
    r = params_a[:, 0]
    h = params_b[:, :3]
    c_local = quat.rotate_inv(orn_b, pos_a - pos_b)          # sphere center in box space
    clamped = jnp.clip(c_local, -h, h)
    delta = c_local - clamped
    outside_d = vec.length(delta)
    inside = outside_d < 1e-9

    # outside: normal from box surface toward center
    n_out = vec.normalize_or(delta, jnp.array([0.0, 1.0, 0.0]))
    dist_out = outside_d - r

    # inside: least-penetration face
    pen = h - jnp.abs(c_local)                                # [K,3] >= 0
    k = jnp.argmin(pen, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(c_local, k[:, None], 1)[:, 0])
    sign = jnp.where(sign == 0, 1.0, sign)
    n_in = axis_onehot(k.astype(jnp.float32)) * sign[:, None]
    dist_in = -(jnp.take_along_axis(pen, k[:, None], 1)[:, 0] + r)
    closest_in = jnp.where(
        (jnp.arange(3)[None, :] == k[:, None]),
        sign[:, None] * h, c_local)

    n_local = jnp.where(inside[:, None], n_in, n_out)
    dist = jnp.where(inside, dist_in, dist_out)
    closest = jnp.where(inside[:, None], closest_in, clamped)

    n_world = quat.rotate(orn_b, n_local)
    pb_w = pos_b + quat.rotate(orn_b, closest)
    pa_w = pos_a - n_world * r[:, None]
    return _single_point(pos_a, orn_a, pos_b, orn_b, pa_w, pb_w, n_world, dist,
                         jnp.ones_like(dist, bool), ATTACH_B, threshold)


def collide_sphere_capsule(pos_a, orn_a, params_a, pos_b, orn_b, params_b,
                           threshold):
    """reference: src/edyn/collision/collide/collide_capsule_sphere.cpp
    (swapped: sphere is A here per canonical type order)."""
    ra = params_a[:, 0]
    rb = params_b[:, 0]
    hlb = params_b[:, 1]
    axis_b = quat.rotate(orn_b, axis_onehot(params_b[:, 2]))
    e0 = pos_b - axis_b * hlb[:, None]
    e1 = pos_b + axis_b * hlb[:, None]
    _, cb, _ = geom.closest_point_segment(e0, e1, pos_a)
    d = pos_a - cb
    n = vec.normalize_or(d, jnp.array([0.0, 1.0, 0.0]))
    dist = vec.length(d) - ra - rb
    pa_w = pos_a - n * ra[:, None]
    pb_w = cb + n * rb[:, None]
    return _single_point(pos_a, orn_a, pos_b, orn_b, pa_w, pb_w, n, dist,
                         jnp.ones_like(dist, bool), ATTACH_NONE, threshold)


def collide_capsule_capsule(pos_a, orn_a, params_a, pos_b, orn_b, params_b,
                            threshold):
    """reference: src/edyn/collision/collide/collide_capsule_capsule.cpp.
    Emits the closest-point contact plus, for near-parallel capsules, a second
    point at the other end of the projected overlap (the reference emits two
    points for parallel axes)."""
    ra, hla = params_a[:, 0], params_a[:, 1]
    rb, hlb = params_b[:, 0], params_b[:, 1]
    ax_a = quat.rotate(orn_a, axis_onehot(params_a[:, 2]))
    ax_b = quat.rotate(orn_b, axis_onehot(params_b[:, 2]))
    a0 = pos_a - ax_a * hla[:, None]
    a1 = pos_a + ax_a * hla[:, None]
    b0 = pos_b - ax_b * hlb[:, None]
    b1 = pos_b + ax_b * hlb[:, None]
    s, t, ca, cb, _ = geom.closest_point_segment_segment(a0, a1, b0, b1)
    d = ca - cb
    n = vec.normalize_or(d, vec.normalize_or(vec.cross(ax_a, ax_b),
                                             jnp.array([0.0, 1.0, 0.0])))
    dist = vec.length(d) - ra - rb

    # parallel second point: project B's segment onto A's axis, take overlap
    par = jnp.abs(vec.dot(ax_a, ax_b)) > 0.999
    tb0 = vec.dot(b0 - pos_a, ax_a)
    tb1 = vec.dot(b1 - pos_a, ax_a)
    lo = jnp.maximum(-hla, jnp.minimum(tb0, tb1))
    hi = jnp.minimum(hla, jnp.maximum(tb0, tb1))
    has_overlap = hi > lo
    # endpoints of overlap on A's axis
    pa_line0 = pos_a + ax_a * lo[:, None]
    pa_line1 = pos_a + ax_a * hi[:, None]
    # second point = overlap endpoint farther from the closest point
    d_e0 = vec.length_sqr(pa_line0 - ca)
    d_e1 = vec.length_sqr(pa_line1 - ca)
    p2_axis = jnp.where((d_e0 > d_e1)[:, None], pa_line0, pa_line1)
    valid2 = par & has_overlap

    pa1_w = ca - n * ra[:, None]
    pb1_w = cb + n * rb[:, None]
    pa2_w = p2_axis - n * ra[:, None]
    # corresponding point on B: project p2_axis onto B segment
    _, cb2, _ = geom.closest_point_segment(b0, b1, p2_axis)
    pb2_w = cb2 + n * rb[:, None]
    dist2 = vec.dot(p2_axis - cb2, n) - ra - rb

    K = pos_a.shape[0]
    z = jnp.zeros((K, 2, 3))
    pa_w = jnp.concatenate([pa1_w[:, None], pa2_w[:, None], z], 1)
    pb_w = jnp.concatenate([pb1_w[:, None], pb2_w[:, None], z], 1)
    dists = jnp.stack([dist, dist2, jnp.zeros(K), jnp.zeros(K)], 1)
    pv = jnp.stack([jnp.ones(K, bool), valid2,
                    jnp.zeros(K, bool), jnp.zeros(K, bool)], 1)
    return make_result(pos_a, orn_a, pos_b, orn_b, pa_w, pb_w,
                       n[:, None, :], dists, pv,
                       jnp.full((K, 4), ATTACH_NONE, jnp.int32), threshold)
