"""Batched raycasting.

Reference: include/edyn/collision/raycast.hpp (+ per-shape kernels in
src/edyn/collision/raycast.cpp:58-403). The reference walks the broadphase
tree per ray and double-dispatches per shape; here Q rays test all body AABBs
at once (masked), keep up to H candidates each, and evaluate every shape
formula masked by type — one fused program, arbitrarily many rays per call
(the reference's async raycast batching, raycast_service.cpp, comes free).

Returns per ray: fraction t in [0,1], hit entity (-1 = miss), world normal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..math import geom, quat, vec
from ..shapes.params import ShapeType
from .kernels.common import axis_onehot

BIG = 1e30

# feature kinds reported per hit (flattened encoding of the reference's
# per-shape raycast info variants, include/edyn/collision/raycast.hpp:33-120):
# FACE       sub_index = face id (box: axis*2 + (negative side), matching
#            box_shape face ordering; cylinder: cap disc 0 (+axis) / 1;
#            polyhedron: face table row)
# SIDE       curved side wall of a cylinder/capsule (no sub index)
# HEMISPHERE capsule cap, sub_index 0 (+axis) / 1 (-axis)
# TRIANGLE   mesh hit, sub_index = triangle id in the body's mesh table row
FEAT_NONE, FEAT_FACE, FEAT_SIDE, FEAT_HEMISPHERE, FEAT_TRIANGLE = 0, 1, 2, 3, 4


def _ray_shape_local(stype, params, verts, vert_mask, face_normals, face_mask,
                     p0, d):
    """Ray vs shape in the shape's object space. Returns
    (t, normal_local, feature, sub_index). All inputs batched [C, ...];
    masked evaluation over shape types."""
    C = p0.shape[0]
    t_out = jnp.full((C,), BIG)
    n_out = jnp.zeros((C, 3))
    f_out = jnp.zeros((C,), jnp.int32)
    s_out = jnp.zeros((C,), jnp.int32)
    zi = jnp.zeros((C,), jnp.int32)

    def merge(mask, t, n, feat=None, sub=None):
        nonlocal t_out, n_out, f_out, s_out
        better = mask & (t < t_out)
        t_out = jnp.where(better, t, t_out)
        n_out = jnp.where(better[:, None], n, n_out)
        f_out = jnp.where(better, FEAT_NONE if feat is None else feat, f_out)
        s_out = jnp.where(better, zi if sub is None else sub, s_out)

    st = stype

    # SPHERE
    r = params[:, 0]
    t_s = geom.intersect_ray_sphere(p0, d, jnp.zeros_like(p0), r)
    n_s = vec.normalize(p0 + d * t_s[:, None])
    merge(st == ShapeType.SPHERE, t_s, n_s)

    # PLANE (object-space normal/constant in params)
    pn = params[:, :3]
    pc = params[:, 3]
    t_p = geom.intersect_ray_plane(p0, d, pn, pc)
    merge(st == ShapeType.PLANE, t_p, pn)

    # BOX: slab test
    h = params[:, :3]
    t_enter, t_exit = geom.intersect_ray_aabb(p0, d, -h, h)
    hit_b = (t_enter <= t_exit)
    p_hit = p0 + d * t_enter[:, None]
    # face normal: axis of largest |p|/h ratio
    ratio = jnp.abs(p_hit) / jnp.maximum(h, 1e-9)
    ax = jnp.argmax(ratio, axis=-1)
    sign_ax = jnp.sign(jnp.take_along_axis(p_hit, ax[:, None], 1))
    n_b = axis_onehot(ax.astype(jnp.float32)) * sign_ax
    face_b = (ax.astype(jnp.int32) * 2
              + (sign_ax[:, 0] < 0).astype(jnp.int32))
    merge((st == ShapeType.BOX) & hit_b, jnp.where(hit_b, t_enter, BIG), n_b,
          FEAT_FACE, face_b)

    # CAPSULE: cylinder side + 2 sphere caps
    rc = params[:, 0]
    hl = params[:, 1]
    axis = axis_onehot(params[:, 2])
    t_cap = jnp.full((C,), BIG)
    n_cap = jnp.zeros((C, 3))
    f_cap = jnp.full((C,), FEAT_SIDE, jnp.int32)
    s_cap = jnp.zeros((C,), jnp.int32)
    # side: project out the axis component
    p0p = p0 - axis * vec.dot(p0, axis)[:, None]
    dp = d - axis * vec.dot(d, axis)[:, None]
    a_q = vec.length_sqr(dp)
    b_q = vec.dot(p0p, dp)
    c_q = vec.length_sqr(p0p) - rc * rc
    disc = b_q * b_q - a_q * c_q
    ok = (disc >= 0) & (a_q > 1e-12)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = (-b_q - sq) / jnp.maximum(a_q, 1e-12)
    z = vec.dot(p0 + d * t_side[:, None], axis)
    ok_side = ok & (t_side >= 0) & (jnp.abs(z) <= hl)
    n_side = vec.normalize((p0 + d * t_side[:, None]) - axis * z[:, None])
    t_cap = jnp.where(ok_side, t_side, t_cap)
    n_cap = jnp.where(ok_side[:, None], n_side, n_cap)
    for ci, sgn in enumerate((1.0, -1.0)):
        cc = axis * hl[:, None] * sgn
        t_c = geom.intersect_ray_sphere(p0, d, cc, rc)
        better = t_c < t_cap
        n_c = vec.normalize(p0 + d * t_c[:, None] - cc)
        t_cap = jnp.where(better, t_c, t_cap)
        n_cap = jnp.where(better[:, None], n_c, n_cap)
        f_cap = jnp.where(better, FEAT_HEMISPHERE, f_cap)
        s_cap = jnp.where(better, ci, s_cap)
    merge(st == ShapeType.CAPSULE, t_cap, n_cap, f_cap, s_cap)

    # CYLINDER: side within |z|<=hl + cap disks
    t_cyl = jnp.where(ok & (t_side >= 0) & (jnp.abs(z) <= hl), t_side, BIG)
    n_cyl = n_side
    f_cyl = jnp.full((C,), FEAT_SIDE, jnp.int32)
    s_cyl = jnp.zeros((C,), jnp.int32)
    for ci, sgn in enumerate((1.0, -1.0)):
        denom = vec.dot(d, axis) * sgn
        t_d = (hl - vec.dot(p0, axis) * sgn) / jnp.where(
            jnp.abs(denom) > 1e-9, denom, 1e-9)
        p_d = p0 + d * t_d[:, None]
        radial = p_d - axis * vec.dot(p_d, axis)[:, None]
        ok_d = (jnp.abs(denom) > 1e-9) & (t_d >= 0) & (
            vec.length_sqr(radial) <= rc * rc)
        better = ok_d & (t_d < t_cyl)
        t_cyl = jnp.where(better, t_d, t_cyl)
        n_cyl = jnp.where(better[:, None], axis * sgn, n_cyl)
        f_cyl = jnp.where(better, FEAT_FACE, f_cyl)
        s_cyl = jnp.where(better, ci, s_cyl)
    merge(st == ShapeType.CYLINDER, t_cyl, n_cyl, f_cyl, s_cyl)

    # POLYHEDRON: convex half-space clipping over face planes
    if face_normals.shape[1] > 0:
        # face plane offset = max over verts of dot(v, n_f)
        proj = jnp.einsum("cvd,cfd->cvf", verts, face_normals)
        proj = jnp.where(vert_mask[:, :, None], proj, -BIG)
        off = jnp.max(proj, axis=1)                       # [C,F]
        dn = jnp.einsum("cd,cfd->cf", d, face_normals)
        pn_ = jnp.einsum("cd,cfd->cf", p0, face_normals)
        t_f = (off - pn_) / jnp.where(jnp.abs(dn) > 1e-9, dn, 1e-9)
        entering = dn < 0
        fm = face_mask & (jnp.abs(dn) > 1e-9)
        t_near = jnp.max(jnp.where(fm & entering, t_f, -BIG), axis=1)
        t_far = jnp.min(jnp.where(fm & ~entering, t_f, BIG), axis=1)
        # start-inside handling: parallel & outside => miss
        outside_par = jnp.any(face_mask & (jnp.abs(dn) <= 1e-9)
                              & (pn_ > off), axis=1)
        hit_ph = (t_near <= t_far) & (t_far >= 0) & ~outside_par
        t_ph = jnp.maximum(t_near, 0.0)
        near_idx = jnp.argmax(jnp.where(fm & entering, t_f, -BIG), axis=1)
        n_ph = jnp.take_along_axis(face_normals, near_idx[:, None, None].repeat(3, -1), 1)[:, 0]
        merge((st == ShapeType.POLYHEDRON) & hit_ph,
              jnp.where(hit_ph, t_ph, BIG), n_ph,
              FEAT_FACE, near_idx.astype(jnp.int32))

    return t_out, n_out, f_out, s_out


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def raycast(state, p0, p1, max_candidates: int = 16):
    """Batched raycast: p0, p1 [Q,3] world-space segment endpoints.

    Returns dict(fraction [Q], entity [Q] (-1 miss), normal [Q,3] world).
    reference: edyn::raycast (src/edyn/collision/raycast.cpp:20-57)."""
    Q = p0.shape[0]
    N = state.capacity
    d = p1 - p0

    # broadphase: segment vs all fat AABBs [Q,N]
    t_en, t_ex = geom.intersect_ray_aabb(
        p0[:, None, :], d[:, None, :], state.aabb_min[None], state.aabb_max[None])
    hit_aabb = (t_en <= t_ex) & (t_en <= 1.0) & state.valid[None, :] & \
        (state.shape_type[None, :] != ShapeType.NONE)

    # candidate selection per ray
    H = min(max_candidates, N)
    order = jnp.argsort(jnp.where(hit_aabb, t_en, BIG), axis=1)
    cand = order[:, :H]                                      # [Q,H]
    cand_ok = jnp.take_along_axis(hit_aabb, cand, axis=1)

    flat = cand.reshape(-1)
    C = flat.shape[0]
    # ray into each candidate body's object space
    pos_c = state.origin_pos()[flat]
    orn_c = state.orn[flat]
    p0_l = quat.rotate_inv(orn_c, jnp.repeat(p0, H, 0) - pos_c)
    d_l = quat.rotate_inv(orn_c, jnp.repeat(d, H, 0))

    poly = state.poly
    if poly.verts.shape[0] > 0:
        si = jnp.clip(state.shape_index[flat], 0, poly.verts.shape[0] - 1)
        verts = poly.verts[si]
        vmask = poly.vert_mask[si]
        fnorm = poly.face_normals[si]
        fmask = poly.face_mask[si] & (
            state.shape_type[flat] == ShapeType.POLYHEDRON)[:, None]
    else:
        verts = jnp.zeros((C, 0, 3))
        vmask = jnp.zeros((C, 0), bool)
        fnorm = jnp.zeros((C, 0, 3))
        fmask = jnp.zeros((C, 0), bool)

    t_l, n_l, f_l, s_l = _ray_shape_local(
        state.shape_type[flat], state.shape_params[flat],
        verts, vmask, fnorm, fmask, p0_l, d_l)
    child_l = jnp.full((C,), -1, jnp.int32)

    # MESH candidates: walk the baked candidate grid along the ray instead of
    # testing every triangle (reference walks the static BVH, raycast.cpp:380;
    # here: sample the ray at cell-size spacing, gather each cell's <=CAP
    # triangle ids, Moller-Trumbore only those). Work per candidate is
    # S*CAP triangles regardless of mesh size.
    mesh = state.mesh
    if mesh.tri_verts.shape[0] > 0:
        RAY_CELLS = 32  # grid cells sampled along the segment
        is_mesh = (state.shape_type[flat] == ShapeType.MESH) | \
                  (state.shape_type[flat] == ShapeType.PAGED_MESH)
        msi = jnp.clip(state.shape_index[flat], 0, mesh.tri_verts.shape[0] - 1)
        cell = mesh.grid_cell[msi]                                # [C]
        # sample points spaced one cell apart (covers |d| up to S*cell; the
        # tail sample set is clamped to the segment end so short rays hit
        # every cell and long rays degrade to sparse sampling + the end cell)
        dlen = jnp.maximum(vec.length(d_l), 1e-9)
        step_t = jnp.minimum(cell / dlen, 1.0 / RAY_CELLS)
        ts = jnp.minimum(step_t[:, None] * jnp.arange(RAY_CELLS + 1)[None, :],
                         1.0)                                     # [C,S+1]
        pts = p0_l[:, None, :] + d_l[:, None, :] * ts[..., None]  # [C,S+1,3]
        from ..shapes.mesh import candidate_tris
        S1 = RAY_CELLS + 1
        ids = candidate_tris(mesh, jnp.repeat(msi, S1),
                             pts.reshape(-1, 3))                  # [C*S1,CAP]
        ids = ids.reshape(C, -1)                                  # [C,S1*CAP]
        ok_id = ids >= 0
        idc = jnp.maximum(ids, 0)
        tv = mesh.tri_verts[msi[:, None], idc]                    # [C,K,3,3]
        t_tri, hit_tri = geom.intersect_segment_triangle(
            p0_l[:, None, :], d_l[:, None, :],
            tv[:, :, 0], tv[:, :, 1], tv[:, :, 2])
        tmask = mesh.tri_mask[msi[:, None], idc] & ok_id
        t_tri = jnp.where(tmask & hit_tri, t_tri, BIG)
        best_tri = jnp.argmin(t_tri, axis=1)
        t_m = jnp.take_along_axis(t_tri, best_tri[:, None], 1)[:, 0]
        best_id = jnp.take_along_axis(idc, best_tri[:, None], 1)[:, 0]
        n_m = mesh.tri_normal[msi, best_id]
        # orient the surface normal against the ray
        n_m = jnp.where(vec.dot(n_m, d_l)[:, None] > 0, -n_m, n_m)
        better = is_mesh & (t_m < t_l)
        t_l = jnp.where(better, t_m, t_l)
        n_l = jnp.where(better[:, None], n_m, n_l)
        f_l = jnp.where(better, FEAT_TRIANGLE, f_l)
        s_l = jnp.where(better, best_id.astype(jnp.int32), s_l)

    # COMPOUND candidates: per-child exact raycast, min over children
    # (reference: raycast.cpp:323 compound dispatch into child shapes)
    ct = state.compound
    if ct.child_row.shape[0] > 0:
        is_comp = state.shape_type[flat] == ShapeType.COMPOUND
        ci = jnp.clip(state.shape_index[flat], 0, ct.child_row.shape[0] - 1)
        CH = ct.child_row.shape[1]
        rows = jnp.maximum(ct.child_row[ci], 0)              # [C,CH]
        cmask = ct.child_mask[ci]
        cpos = ct.child_pos[ci]
        corn = ct.child_orn[ci]
        ctype = ct.child_type[ci].reshape(-1)
        cprm = ct.child_params[ci].reshape(-1, 4)
        p0_c = quat.rotate_inv(corn, p0_l[:, None, :] - cpos)
        d_c = quat.rotate_inv(corn, d_l[:, None, :])
        CC = C * CH
        cx = state.convex
        rflat = rows.reshape(-1)
        fm_c = cx.face_mask[rflat] & \
            (ctype == ShapeType.POLYHEDRON)[:, None]
        t_c, n_c, f_c, s_c = _ray_shape_local(
            ctype, cprm, cx.verts[rflat], cx.vert_mask[rflat],
            cx.face_normals[rflat], fm_c,
            p0_c.reshape(CC, 3), d_c.reshape(CC, 3))
        t_c = jnp.where(cmask.reshape(-1), t_c, BIG).reshape(C, CH)
        n_b = quat.rotate(corn.reshape(CC, 4), n_c).reshape(C, CH, 3)
        bi = jnp.argmin(t_c, axis=1)
        t_comp = jnp.take_along_axis(t_c, bi[:, None], 1)[:, 0]
        n_comp = jnp.take_along_axis(
            n_b, bi[:, None, None].repeat(3, -1), 1)[:, 0]
        f_comp = jnp.take_along_axis(f_c.reshape(C, CH), bi[:, None], 1)[:, 0]
        s_comp = jnp.take_along_axis(s_c.reshape(C, CH), bi[:, None], 1)[:, 0]
        better = is_comp & (t_comp < t_l)
        t_l = jnp.where(better, t_comp, t_l)
        n_l = jnp.where(better[:, None], n_comp, n_l)
        f_l = jnp.where(better, f_comp, f_l)
        s_l = jnp.where(better, s_comp, s_l)
        child_l = jnp.where(better, bi.astype(jnp.int32), child_l)

    t = jnp.where(cand_ok.reshape(-1), t_l, BIG).reshape(Q, H)
    n_w = quat.rotate(orn_c, n_l).reshape(Q, H, 3)

    best = jnp.argmin(t, axis=1)
    take = lambda x: jnp.take_along_axis(x.reshape(Q, H), best[:, None], 1)[:, 0]
    t_best = take(t.reshape(-1))
    hit = t_best <= 1.0
    entity = jnp.where(hit, jnp.take_along_axis(cand, best[:, None], 1)[:, 0], -1)
    normal = jnp.take_along_axis(n_w, best[:, None, None].repeat(3, -1), 1)[:, 0]
    return {
        "fraction": jnp.where(hit, t_best, 1.0),
        "entity": entity,
        "normal": jnp.where(hit[:, None], normal, 0.0),
        # per-shape feature detail (reference shape_raycast_result info
        # variants, raycast.hpp:33-120): FEAT_* kind, its sub index, and the
        # compound child index (-1 when the hit body isn't a compound)
        "feature": jnp.where(hit, take(f_l), FEAT_NONE),
        "sub_index": jnp.where(hit, take(s_l), 0),
        "child_index": jnp.where(hit, take(child_l), -1),
    }
