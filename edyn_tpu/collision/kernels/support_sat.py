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
from .support import Side, edge_dirs, face_axes, support_point, support_projection

TILT = 0.02  # radians-scale tangent tilt for patch sampling


def collide_support(A: Side, B: Side, threshold, axis_validity=None,
                    orient_ref=None, clamp_flat: bool = True):
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

    axes = jnp.concatenate([fa, fb, cr], axis=1)   # [K,X,3]
    amask = jnp.concatenate([fam, fbm, crm], axis=1)
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

    # patch sampling dirs
    t1, t2 = vec.orthonormal_basis(n)
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
    # if it lies inside BOTH shapes' tangent-plane footprint (slab bounds
    # along t1/t2) — without this, a flat feature contributes its far corners
    # against a small/curved shape. When BOTH supporting features are flat
    # (zero radius, >=2 support verts on the contact plane), out-of-slab
    # candidates are CLAMPED into the footprint intersection instead of
    # rejected — the rectangle-clip that makes crossed faces (e.g. X-stacked
    # bars, whose support points are all outside the overlap region) produce
    # their mid-face contact patch (the support-mapped analogue of the
    # reference's face-clipping, SURVEY A.3).
    tol = 5e-3

    def flat_feature(S_, d):
        from .support import world_verts
        proj = jnp.sum(world_verts(S_) * d[:, None, :], -1)
        proj = jnp.where(S_.vert_mask, proj, -1e30)
        maxp = jnp.max(proj, axis=-1, keepdims=True)
        cnt = jnp.sum(proj >= maxp - 1e-4, axis=-1)
        return (S_.radius < 1e-9) & (cnt >= 2)

    if clamp_flat:
        both_flat = (flat_feature(A, -n) & flat_feature(B, n))[:, None]
    else:
        # mesh kernels disable clamping: a triangle's tangent slab is its
        # bounding RECTANGLE, so clamped points can land outside the actual
        # triangle; the multi-triangle fold supplies patch coverage instead
        both_flat = jnp.zeros((K, 1), bool)

    shift = jnp.zeros_like(on_a)
    for t in (t1, t2):
        hi_a = support_projection(A, t)
        lo_a = -support_projection(A, -t)
        hi_b = support_projection(B, t)
        lo_b = -support_projection(B, -t)
        lo = jnp.maximum(lo_a, lo_b)[:, None]
        hi = jnp.minimum(hi_a, hi_b)[:, None]
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
               clamp_flat=True):
        return collide_support(A, B, threshold, axis_validity, orient_ref,
                               clamp_flat)
    kernel.__name__ = "support_sat_unified"
    return kernel
