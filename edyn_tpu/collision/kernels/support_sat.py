"""Generic support-mapped SAT kernel for arbitrary convex shape pairs.

Covers the reference's bespoke collide() matrix
(src/edyn/collision/collide/ — cylinder_cylinder, polyhedron_*, capsule_box,
etc.) with ONE batched kernel over the unified convex representation
(shapes/convex.py):

1. Candidate axes = face normals of A + face normals of B + the center-delta
   direction + cross products of edge directions (the same axis enumeration
   the reference does per pair, e.g. collide_polyhedron_polyhedron.cpp).
2. Separation along axis n (oriented B -> A): sep = -P_A(-n) - P_B(n), where
   P is the exact support projection.
3. Contact patch via perturbed support sampling: support points of each body
   along the contact normal tilted toward the 4 tangent directions. Flat
   features yield their corners (true depth is re-measured along the
   unperturbed normal, so flat patches carry zero tilt error); rounded
   features yield a single point, with tilted samples naturally rejected by
   the collision threshold. Candidates laterally outside either body's
   tangent-plane footprint are rejected (the support-mapped equivalent of the
   reference's clipping), then reduced to <=4 maximizing spread (the
   reference's insertion_point_index heuristic).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vec
from .common import ATTACH_NONE, gather_points, make_result, reduce_to_4
from .support import (Side, edge_dirs, face_axes, support_point,
                      support_projection, world_disc_axis, world_verts)

TILT = 0.02  # radians-scale tangent tilt for patch sampling


def _closest_on_circle(c, w, r, x):
    """Closest point on the circle (center c, unit normal w, radius r) to x.
    All [K,3]."""
    u = x - c
    perp = u - jnp.sum(u * w, -1, keepdims=True) * w
    t1, _ = vec.orthonormal_basis(w)
    dirn = vec.normalize_or(perp, t1)
    return c + r[..., None] * dirn


def _closest_on_segment(q0, q1, x):
    d = q1 - q0
    dd = jnp.sum(d * d, -1, keepdims=True)
    t = jnp.clip(jnp.sum((x - q0) * d, -1, keepdims=True)
                 / jnp.maximum(dd, 1e-12), 0.0, 1.0)
    return q0 + t * d


def _top2_verts(S: Side, d):
    """The two highest-projection cloud verts along d [K,3] — the supporting
    edge segment (or a degenerate point for 1-vert shapes)."""
    vw = world_verts(S)
    proj = jnp.sum(vw * d[:, None, :], -1)
    proj = jnp.where(S.vert_mask, proj, -1e30)
    i0 = jnp.argmax(proj, -1)
    proj2 = jnp.where(jnp.arange(proj.shape[1])[None, :] == i0[:, None],
                      -1e30, proj)
    i1 = jnp.argmax(proj2, -1)
    has2 = jnp.take_along_axis(proj2, i1[:, None], 1)[:, 0] > -1e29
    q0 = jnp.take_along_axis(vw, i0[:, None, None].repeat(3, -1), 1)[:, 0]
    q1 = jnp.take_along_axis(vw, i1[:, None, None].repeat(3, -1), 1)[:, 0]
    return q0, jnp.where(has2[:, None], q1, q0)


def _rim_axes(A: Side, B: Side, n_seed, iters: int = 8):
    """Candidate separating axes from cylinder cap-edge (rim) features, via
    alternating closest-point projection between the supporting rim circle
    and the other body's supporting feature (segment / rim circle / point).

    Batched analogue of the reference's closest_point_circle_line /
    closest_point_circle_circle minimizations
    (src/edyn/math/geom.cpp:217-476) — it refines the rim-vs-edge and
    rim-vs-rim contact normal that no face/edge-cross SAT axis captures.
    Extra axes are harmless when inapplicable: SAT takes the max separation
    over candidates, and every support projection is exact.

    Returns (axes [K,2,3], mask [K,2])."""
    K = A.pos.shape[0]

    def one(C_, D_):  # rim of C_ vs supporting feature of D_ (seed: C_ above)
        wC = world_disc_axis(C_)
        # supporting cap center of C_ facing D_: deepest vert along -n_seed
        vw = world_verts(C_)
        proj = jnp.sum(vw * (-n_seed[:, None, :]), -1)
        proj = jnp.where(C_.vert_mask, proj, -1e30)
        i0 = jnp.argmax(proj, -1)
        cC = jnp.take_along_axis(vw, i0[:, None, None].repeat(3, -1), 1)[:, 0]
        rC = C_.disc_r

        d_is_disc = D_.disc_r > 1e-9
        wD = world_disc_axis(D_)
        vwd = world_verts(D_)
        projd = jnp.sum(vwd * n_seed[:, None, :], -1)
        projd = jnp.where(D_.vert_mask, projd, -1e30)
        j0 = jnp.argmax(projd, -1)
        cD = jnp.take_along_axis(vwd, j0[:, None, None].repeat(3, -1), 1)[:, 0]
        q0, q1 = _top2_verts(D_, n_seed)

        def closest_D(p):
            on_circ = _closest_on_circle(cD, wD, D_.disc_r, p)
            on_seg = _closest_on_segment(q0, q1, p)
            return jnp.where(d_is_disc[:, None], on_circ, on_seg)

        p = _closest_on_circle(cC, wC, rC, cD)
        for _ in range(iters):
            q = closest_D(p)
            p = _closest_on_circle(cC, wC, rC, q)
        ax = p - q  # D -> C; caller orients toward A
        ok = (C_.disc_r > 1e-9) & (vec.length(ax) > 1e-7)
        return vec.normalize_or(ax, n_seed), ok

    ax_a, ok_a = one(A, B)
    ax_b, ok_b = one(B, A)
    return (jnp.stack([ax_a, ax_b], 1),
            jnp.stack([ok_a, ok_b], 1))


def collide_support(A: Side, B: Side, threshold, axis_validity=None,
                    orient_ref=None, clamp_flat: bool = True,
                    rim_axes: bool = True):
    """The unified convex-convex kernel.

    axis_validity(axes)->mask restricts admissible separating axes (mesh
    kernels: Voronoi internal-edge rejection); orient_ref [K,3] overrides the
    center-delta axis orientation (mesh kernels: the one-sided surface
    normal, which unlike the center delta never flips under penetration)."""
    K = A.pos.shape[0]
    delta = orient_ref if orient_ref is not None else A.pos - B.pos

    fa, fam = face_axes(A, B.pos)
    fb, fbm = face_axes(B, A.pos)
    ea, eam = edge_dirs(A)
    eb, ebm = edge_dirs(B)
    if ea.shape[1] and eb.shape[1]:
        cr = vec.cross(ea[:, :, None, :], eb[:, None, :, :]).reshape(K, -1, 3)
        crm = (eam[:, :, None] & ebm[:, None, :]).reshape(K, -1)
        crl = vec.length(cr)
        crm &= crl > 1e-6
        cr = cr / jnp.maximum(crl, 1e-12)[..., None]
    else:
        cr = jnp.zeros((K, 0, 3))
        crm = jnp.zeros((K, 0), bool)

    if rim_axes:
        seed = vec.normalize_or(delta, jnp.broadcast_to(
            jnp.array([0.0, 1.0, 0.0]), delta.shape))
        ra, ram = _rim_axes(A, B, seed)
    else:
        ra = jnp.zeros((K, 0, 3))
        ram = jnp.zeros((K, 0), bool)

    axes = jnp.concatenate([fa, fb, cr, ra], axis=1)   # [K,X,3]
    amask = jnp.concatenate([fam, fbm, crm, ram], axis=1)
    # orient every axis toward A
    sign = jnp.where(jnp.sum(axes * delta[:, None, :], -1) >= 0, 1.0, -1.0)
    axes = axes * sign[..., None]
    if axis_validity is not None:
        amask &= axis_validity(axes)

    # separation per axis
    pa_proj = -support_projection(A, -axes)        # min_A proj = -P_A(-n)
    pb_proj = support_projection(B, axes)          # max_B proj
    sep = pa_proj - pb_proj
    sep = jnp.where(amask, sep, -jnp.inf)
    best = jnp.argmax(sep, axis=-1)
    best_sep = jnp.take_along_axis(sep, best[:, None], 1)[:, 0]
    n = jnp.take_along_axis(axes, best[:, None, None].repeat(3, -1), 1)[:, 0]

    plane_a = jnp.take_along_axis(pa_proj, best[:, None], 1)[:, 0]
    plane_b = jnp.take_along_axis(pb_proj, best[:, None], 1)[:, 0]

    # tangent basis: aligned with a LINE supporting feature when one exists
    # (cylinder side, box edge, capsule core) — per-axis slab clamping below
    # is only exact when the feature is axis-aligned in (t1,t2); an
    # arbitrary basis would clamp onto the line's bounding parallelogram.
    def line_feature_dir(S_, d):
        vw = world_verts(S_)
        proj = jnp.sum(vw * d[:, None, :], -1)
        proj = jnp.where(S_.vert_mask, proj, -1e30)
        maxp = jnp.max(proj, axis=-1, keepdims=True)
        feat = (proj >= maxp - 1e-3) & S_.vert_mask
        cnt = jnp.sum(feat, -1)
        cen = jnp.sum(jnp.where(feat[..., None], vw, 0.0), 1) \
            / jnp.maximum(cnt, 1)[:, None]
        diffs = jnp.where(feat[..., None], vw - cen[:, None, :], 0.0)
        d2 = jnp.sum(diffs * diffs, -1)
        e = jnp.take_along_axis(
            diffs, jnp.argmax(d2, -1)[:, None, None].repeat(3, -1), 1)[:, 0]
        return e, cnt == 2

    eA, lineA = line_feature_dir(A, -n)
    eB, lineB = line_feature_dir(B, n)
    e = jnp.where(lineB[:, None], eB, eA)
    e_t = e - jnp.sum(e * n, -1, keepdims=True) * n
    use_line = (lineA | lineB) & (vec.length(e_t) > 1e-6)
    t1d, t2d = vec.orthonormal_basis(n)
    t1 = jnp.where(use_line[:, None], vec.normalize_or(e_t, t1d), t1d)
    t2 = jnp.where(use_line[:, None], vec.cross(n, t1), t2d)
    tilts = jnp.stack([jnp.zeros_like(t1), t1, -t1, t2, -t2], axis=1)  # [K,5,3]
    dirs_a = vec.normalize(-n[:, None, :] + TILT * tilts)
    dirs_b = vec.normalize(n[:, None, :] + TILT * tilts)

    pa_pts = support_point(A, dirs_a)              # [K,5,3]
    pb_pts = support_point(B, dirs_b)

    depth_a = jnp.sum(pa_pts * n[:, None, :], -1) - plane_b[:, None]
    depth_b = plane_a[:, None] - jnp.sum(pb_pts * n[:, None, :], -1)

    cand_a_on_a = pa_pts
    cand_a_on_b = pa_pts - n[:, None, :] * depth_a[..., None]
    cand_b_on_b = pb_pts
    cand_b_on_a = pb_pts + n[:, None, :] * depth_b[..., None]

    on_a = jnp.concatenate([cand_a_on_a, cand_b_on_a], 1)  # [K,10,3]
    on_b = jnp.concatenate([cand_a_on_b, cand_b_on_b], 1)
    depth = jnp.concatenate([depth_a, depth_b], 1)
    valid = depth < threshold
    valid &= (best_sep < threshold)[:, None]

    # lateral containment: a candidate is a real closest-proximity point only
    # if it lies inside BOTH shapes' SUPPORTING-FEATURE footprint (slab
    # bounds along t1/t2) — without this, a flat feature contributes its far
    # corners against a small/curved shape. When BOTH supporting features are
    # flat (zero radius, >=2 support verts on the contact plane, or a
    # cylinder cap disc), out-of-slab candidates are CLAMPED into the
    # footprint intersection instead of rejected — the rectangle-clip that
    # makes crossed faces (e.g. X-stacked bars, whose support points are all
    # outside the overlap region) produce their mid-face contact patch (the
    # support-mapped analogue of the reference's face-clipping, SURVEY A.3).
    # Slabs are the extent of the supporting FEATURE (verts within FEAT_TOL
    # of max projection + sphere/disc offsets), not the whole body — a
    # body-wide slab would smear a cylinder's side-line contact across its
    # full tangent footprint.
    tol = 5e-3
    FEAT_TOL = 1e-3

    def flat_feature(S_, d):
        proj = jnp.sum(world_verts(S_) * d[:, None, :], -1)
        proj = jnp.where(S_.vert_mask, proj, -1e30)
        maxp = jnp.max(proj, axis=-1, keepdims=True)
        cnt = jnp.sum(proj >= maxp - FEAT_TOL, axis=-1)
        # cylinder cap face: the supporting feature is the whole disc when
        # the contact direction is (anti)parallel to the axis
        cap_face = (S_.disc_r > 1e-9) & \
            (jnp.abs(jnp.sum(world_disc_axis(S_) * d, -1)) > 0.99)
        return (S_.radius < 1e-9) & ((cnt >= 2) | cap_face)

    def feature_slab(S_, d, t):
        """[lo, hi] extent along tangent t of the supporting feature of S_
        in contact direction d (surface set maximizing x.d)."""
        vw = world_verts(S_)
        proj = jnp.sum(vw * d[:, None, :], -1)
        proj = jnp.where(S_.vert_mask, proj, -1e30)
        maxp = jnp.max(proj, axis=-1, keepdims=True)
        feat = proj >= maxp - FEAT_TOL
        vt = jnp.sum(vw * t[:, None, :], -1)
        base_lo = jnp.min(jnp.where(feat, vt, 1e30), -1)
        base_hi = jnp.max(jnp.where(feat, vt, -1e30), -1)
        # sphere-swept offset: the surface point sits radius further along d
        off = S_.radius * jnp.sum(d * t, -1)
        # disc contribution: whole disc when d || axis (cap face), else the
        # single rim point along perp(d)
        w = world_disc_axis(S_)
        dw = jnp.sum(d * w, -1)
        perp = d - dw[:, None] * w
        plen = vec.length(perp)
        cap = jnp.abs(dw) > 0.99
        tw = t - jnp.sum(t * w, -1, keepdims=True) * w
        disc_span = S_.disc_r * vec.length(tw)
        rim_off = S_.disc_r * jnp.sum(perp * t, -1) / jnp.maximum(plen, 1e-12)
        lo = base_lo + off + jnp.where(cap, -disc_span, rim_off)
        hi = base_hi + off + jnp.where(cap, disc_span, rim_off)
        return lo, hi

    if clamp_flat:
        both_flat = (flat_feature(A, -n) & flat_feature(B, n))[:, None]
    else:
        # mesh kernels disable clamping: a triangle's tangent slab is its
        # bounding RECTANGLE, so clamped points can land outside the actual
        # triangle; the multi-triangle fold supplies patch coverage instead
        both_flat = jnp.zeros((K, 1), bool)

    shift = jnp.zeros_like(on_a)
    for t in (t1, t2):
        lo_a, hi_a = feature_slab(A, -n, t)
        lo_b, hi_b = feature_slab(B, n, t)
        lo = jnp.maximum(lo_a, lo_b)[:, None]
        hi = jnp.minimum(hi_a, hi_b)[:, None]
        hi = jnp.maximum(hi, lo)  # guard inverted slabs (disjoint features)
        proj = jnp.sum(on_a * t[:, None, :], -1)
        inside = (proj >= lo - tol) & (proj <= hi + tol)
        valid &= inside | both_flat
        clipped = jnp.clip(proj, lo, hi)
        shift = shift + jnp.where(both_flat[..., None],
                                  (clipped - proj)[..., None] * t[:, None, :],
                                  0.0)
    on_a = on_a + shift
    on_b = on_b + shift
    # selection bias: prefer unshifted candidates at equal depth so the chosen
    # pivots are frame-stable (warm-start matching)
    shifted = jnp.sum(shift * shift, -1) > 1e-12
    sel_depth = depth + jnp.where(shifted, 1e-5, 0.0)

    idx4, pv = reduce_to_4(on_a, sel_depth, valid)
    pa4 = gather_points(on_a, idx4)
    pb4 = gather_points(on_b, idx4)
    d4 = gather_points(depth, idx4)
    return make_result(A.pos, A.orn, B.pos, B.orn, pa4, pb4,
                       n[:, None, :], d4, pv,
                       jnp.full((K, 4), ATTACH_NONE, jnp.int32), threshold)


def make_support_kernel(ta: int = -1, tb: int = -1):
    """Back-compat factory (type args ignored — the kernel is data-driven)."""
    def kernel(A, B, threshold, axis_validity=None, orient_ref=None,
               clamp_flat=True, rim_axes=True):
        return collide_support(A, B, threshold, axis_validity, orient_ref,
                               clamp_flat, rim_axes)
    kernel.__name__ = "support_sat_unified"
    return kernel
