"""Box-box SAT narrowphase, batched & branchless.

Reference: src/edyn/collision/collide/collide_box_box.cpp:16-265 (SURVEY A.3).
The recipe is preserved — 15 candidate axes (3 A faces, 3 B faces, 9 edge
crosses), max-separation axis, then feature clipping — but the scalar
case-by-case clipping becomes masked vector math over a fixed 24-candidate
set: 4 incident-face corners inside the reference rect, 4 reference-face
corners under the incident face, and 16 incident-edge x reference-side 2D
intersections, reduced to the best 4 by depth/spread.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import geom, quat, vec
from .common import ATTACH_A, ATTACH_B, gather_points, make_result, reduce_to_4

EDGE_AXIS_BIAS = 1e-5  # prefer face axes when separations tie (anti-jitter)


def _take_scalar(h, k):
    return jnp.take_along_axis(h, k[:, None], axis=1)[:, 0]


def collide_box_box(pos_a, orn_a, params_a, pos_b, orn_b, params_b, threshold):
    K = pos_a.shape[0]
    ha = params_a[:, :3]
    hb = params_b[:, :3]
    Ra = quat.to_matrix(orn_a)
    Rb = quat.to_matrix(orn_b)
    axes_a = jnp.swapaxes(Ra, -1, -2)  # [K,3,3] rows = world axes
    axes_b = jnp.swapaxes(Rb, -1, -2)
    t = pos_b - pos_a

    # --- 15 candidate axes ---
    cross = vec.cross(axes_a[:, :, None, :], axes_b[:, None, :, :])  # [K,3,3,3]
    cross = cross.reshape(K, 9, 3)
    cross_len = vec.length(cross)
    cross_ok = cross_len > 1e-6
    cross_n = cross / jnp.maximum(cross_len, 1e-12)[..., None]
    axes = jnp.concatenate([axes_a, axes_b, cross_n], axis=1)  # [K,15,3]
    ok = jnp.concatenate([jnp.ones((K, 6), bool), cross_ok], axis=1)

    # separation per axis: |t.L| - (sum hA_i |a_i.L| + sum hB_j |b_j.L|)
    tL = jnp.einsum("kld,kd->kl", axes, t)
    projA = jnp.einsum("kld,kid->kli", axes, axes_a)  # [K,15,3] a_i.L
    projB = jnp.einsum("kld,kid->kli", axes, axes_b)
    extent = (jnp.einsum("ki,kli->kl", ha, jnp.abs(projA))
              + jnp.einsum("ki,kli->kl", hb, jnp.abs(projB)))
    sep = jnp.abs(tL) - extent
    sep = jnp.where(ok, sep, -jnp.inf)
    sep = sep.at[:, 6:].add(-EDGE_AXIS_BIAS)

    best = jnp.argmax(sep, axis=-1)                    # [K]
    best_sep = jnp.take_along_axis(sep, best[:, None], 1)[:, 0]
    L = jnp.take_along_axis(axes, best[:, None, None].repeat(3, -1), 1)[:, 0]
    tl_best = vec.dot(L, t)
    n = jnp.where((tl_best > 0)[:, None], -L, L)       # world normal, B -> A

    is_face = best < 6
    ref_is_a = best < 3

    # =============== face case ===============
    k = jnp.where(ref_is_a, best, best - 3) % 3
    ref_pos = jnp.where(ref_is_a[:, None], pos_a, pos_b)
    inc_pos = jnp.where(ref_is_a[:, None], pos_b, pos_a)
    ref_axes = jnp.where(ref_is_a[:, None, None], axes_a, axes_b)
    inc_axes = jnp.where(ref_is_a[:, None, None], axes_b, axes_a)
    ref_h = jnp.where(ref_is_a[:, None], ha, hb)
    inc_h = jnp.where(ref_is_a[:, None], hb, ha)
    n_out = jnp.where(ref_is_a[:, None], -n, n)        # outward from ref box

    ku = (k + 1) % 3
    kv = (k + 2) % 3
    u = jnp.take_along_axis(ref_axes, ku[:, None, None].repeat(3, -1), 1)[:, 0]
    v = jnp.take_along_axis(ref_axes, kv[:, None, None].repeat(3, -1), 1)[:, 0]
    hk = _take_scalar(ref_h, k)
    hu = _take_scalar(ref_h, ku)
    hv = _take_scalar(ref_h, kv)
    face_center = ref_pos + n_out * hk[:, None]

    # incident face: axis most anti-parallel to n_out
    dots = jnp.einsum("kid,kd->ki", inc_axes, n_out)   # [K,3]
    j = jnp.argmax(jnp.abs(dots), axis=-1)
    sj = -jnp.sign(_take_scalar(dots, j))
    sj = jnp.where(sj == 0, 1.0, sj)
    inc_n = jnp.take_along_axis(inc_axes, j[:, None, None].repeat(3, -1), 1)[:, 0] * sj[:, None]
    hj = _take_scalar(inc_h, j)
    ju = (j + 1) % 3
    jv = (j + 2) % 3
    iu = jnp.take_along_axis(inc_axes, ju[:, None, None].repeat(3, -1), 1)[:, 0]
    iv = jnp.take_along_axis(inc_axes, jv[:, None, None].repeat(3, -1), 1)[:, 0]
    hju = _take_scalar(inc_h, ju)
    hjv = _take_scalar(inc_h, jv)
    inc_center = inc_pos + inc_n * hj[:, None]
    corner_signs = jnp.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], jnp.float32)
    inc_corners = (inc_center[:, None, :]
                   + iu[:, None, :] * (corner_signs[None, :, 0, None] * hju[:, None, None])
                   + iv[:, None, :] * (corner_signs[None, :, 1, None] * hjv[:, None, None]))

    # reference-face 2D frame coordinates of incident corners
    rel = inc_corners - face_center[:, None, :]
    cx = jnp.einsum("kcd,kd->kc", rel, u)
    cy = jnp.einsum("kcd,kd->kc", rel, v)
    cz = jnp.einsum("kcd,kd->kc", rel, n_out)          # height above ref face

    tol = 1e-6
    # (a) incident corners inside reference rect
    a_valid = (jnp.abs(cx) <= hu[:, None] + tol) & (jnp.abs(cy) <= hv[:, None] + tol)
    a_x, a_y, a_z = cx, cy, cz

    # incident plane z(x, y): z = z0 + gx*(x-x0) + gy*(y-y0)
    n_inc_ref = jnp.stack([vec.dot(inc_n, u), vec.dot(inc_n, v), vec.dot(inc_n, n_out)], -1)
    nz = jnp.where(jnp.abs(n_inc_ref[:, 2]) > 1e-6, n_inc_ref[:, 2], 1e-6)
    gx = -n_inc_ref[:, 0] / nz
    gy = -n_inc_ref[:, 1] / nz

    def plane_z(x, y):
        return cz[:, 0:1] + gx[:, None] * (x - cx[:, 0:1]) + gy[:, None] * (y - cy[:, 0:1])

    # (b) reference rect corners under the incident face (2D point-in-quad)
    rx = corner_signs[None, :, 0] * hu[:, None]
    ry = corner_signs[None, :, 1] * hv[:, None]
    # point-in-convex-quad: consistent cross-product sign over the 4 2D edges
    ex = jnp.roll(cx, -1, axis=1) - cx                 # [K,4] edge vectors
    ey = jnp.roll(cy, -1, axis=1) - cy
    px = rx[:, :, None] - cx[:, None, :]               # [K,4pts,4edges]
    py = ry[:, :, None] - cy[:, None, :]
    crossz = ex[:, None, :] * py - ey[:, None, :] * px
    b_valid = jnp.all(crossz >= -tol, axis=-1) | jnp.all(crossz <= tol, axis=-1)
    b_x, b_y = rx, ry
    b_z = plane_z(rx, ry)

    # (c) incident-face edges vs reference rect sides (16 combos)
    # edge p(t) = (cx_i, cy_i) + t*(ex_i, ey_i), t in [0,1]
    def side_hits(c0, e0, c1, e1, bound, other_bound):
        """Intersections with lines c0 + t*e0 = ±bound; returns x,y,valid [K,4e,2]."""
        tt = jnp.stack([(bound - c0) / jnp.where(jnp.abs(e0) > 1e-9, e0, 1e-9),
                        (-bound - c0) / jnp.where(jnp.abs(e0) > 1e-9, e0, 1e-9)], -1)
        bnd = jnp.broadcast_to(bound, c0.shape)
        xx = jnp.stack([bnd, -bnd], -1)
        yy = c1[..., None] + tt * e1[..., None]
        valid = ((tt >= 0) & (tt <= 1)
                 & (jnp.abs(yy) <= other_bound[:, None, None] + tol)
                 & (jnp.abs(e0) > 1e-9)[..., None])
        return tt, xx, yy, valid

    t_u, x_u, y_u, val_u = side_hits(cx, ex, cy, ey, hu[:, None], hv)   # x = ±hu sides
    t_v, y_v, x_v, val_v = side_hits(cy, ey, cx, ex, hv[:, None], hu)   # y = ±hv sides
    c_x = jnp.concatenate([x_u.reshape(K, 8), x_v.reshape(K, 8)], 1)
    c_y = jnp.concatenate([y_u.reshape(K, 8), y_v.reshape(K, 8)], 1)
    t_all = jnp.concatenate([t_u.reshape(K, 8), t_v.reshape(K, 8)], 1)
    edge_idx = jnp.concatenate([jnp.arange(4).repeat(2)[None, :].repeat(K, 0)] * 2, 1)
    z0 = jnp.take_along_axis(cz, edge_idx, 1)
    z1 = jnp.take_along_axis(jnp.roll(cz, -1, 1), edge_idx, 1)
    c_z = z0 + t_all * (z1 - z0)
    c_valid = jnp.concatenate([val_u.reshape(K, 8), val_v.reshape(K, 8)], 1)

    # all candidates
    X = jnp.concatenate([a_x, b_x, c_x], 1)            # [K,24]
    Y = jnp.concatenate([a_y, b_y, c_y], 1)
    Z = jnp.concatenate([a_z, b_z, c_z], 1)
    V = jnp.concatenate([a_valid, b_valid, c_valid], 1)
    V &= Z < threshold

    cand_world = (face_center[:, None, :] + u[:, None, :] * X[..., None]
                  + v[:, None, :] * Y[..., None] + n_out[:, None, :] * Z[..., None])
    idx4, pv_face = reduce_to_4(cand_world, Z, V)
    p_inc = gather_points(cand_world, idx4)            # on incident box
    z4 = gather_points(Z, idx4)
    p_ref = p_inc - n_out[:, None, :] * z4[..., None]  # projected onto ref face

    face_pa = jnp.where(ref_is_a[:, None, None], p_ref, p_inc)
    face_pb = jnp.where(ref_is_a[:, None, None], p_inc, p_ref)
    face_attach = jnp.where(ref_is_a, ATTACH_A, ATTACH_B)

    # =============== edge-edge case ===============
    ei = jnp.clip((best - 6) // 3, 0, 2)
    ej = jnp.clip((best - 6) % 3, 0, 2)
    ai = jnp.take_along_axis(axes_a, ei[:, None, None].repeat(3, -1), 1)[:, 0]
    bj = jnp.take_along_axis(axes_b, ej[:, None, None].repeat(3, -1), 1)[:, 0]
    # support edge centers
    sa = jnp.sign(jnp.einsum("kid,kd->ki", axes_a, -n))
    sa = jnp.where(sa == 0, 1.0, sa)
    maskA = jnp.arange(3)[None, :] != ei[:, None]
    ca = pos_a + jnp.einsum("ki,kid->kd", jnp.where(maskA, sa * ha, 0.0), axes_a)
    sb = jnp.sign(jnp.einsum("kid,kd->ki", axes_b, n))
    sb = jnp.where(sb == 0, 1.0, sb)
    maskB = jnp.arange(3)[None, :] != ej[:, None]
    cb = pos_b + jnp.einsum("ki,kid->kd", jnp.where(maskB, sb * hb, 0.0), axes_b)
    hai = _take_scalar(ha, ei)
    hbj = _take_scalar(hb, ej)
    _, _, pae, pbe, _ = geom.closest_point_segment_segment(
        ca - ai * hai[:, None], ca + ai * hai[:, None],
        cb - bj * hbj[:, None], cb + bj * hbj[:, None])
    edge_dist = vec.dot(pae - pbe, n)

    # =============== combine ===============
    is_face_ = is_face[:, None]
    pa_w = jnp.where(is_face_[..., None], face_pa,
                     jnp.concatenate([pae[:, None], jnp.zeros((K, 3, 3))], 1))
    pb_w = jnp.where(is_face_[..., None], face_pb,
                     jnp.concatenate([pbe[:, None], jnp.zeros((K, 3, 3))], 1))
    dist = jnp.where(is_face_, z4,
                     jnp.concatenate([edge_dist[:, None], jnp.zeros((K, 3))], 1))
    pv_edge = jnp.zeros((K, 4), bool).at[:, 0].set(edge_dist < threshold)
    pv = jnp.where(is_face_, pv_face, pv_edge)
    attach = jnp.where(is_face_, face_attach[:, None],
                       jnp.full((K, 4), 0, jnp.int32))
    # reject pairs fully separated along the best axis
    pv &= (best_sep < threshold)[:, None]

    return make_result(pos_a, orn_a, pos_b, orn_b, pa_w, pb_w,
                       n[:, None, :], dist, pv, attach, threshold)
