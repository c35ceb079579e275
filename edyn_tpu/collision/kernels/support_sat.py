"""Generic support-mapped SAT kernel for arbitrary convex shape pairs.

Covers the long tail of the reference's 28 bespoke collide() kernels
(src/edyn/collision/collide/ — cylinder_cylinder, polyhedron_*, capsule_box,
etc.) with one batched implementation:

1. Candidate axes = face normals of A + face normals of B + cross products of
   edge directions (the same axis enumeration the reference does per pair,
   e.g. collide_polyhedron_polyhedron.cpp's relevant-normal/edge sets).
2. Separation along axis n (oriented B -> A): sep = -P_A(-n) - P_B(n), where
   P is the exact support projection — no hulls or margins.
3. Contact patch via perturbed support sampling: support points of each body
   along the contact normal tilted toward the 4 tangent directions. Flat
   features yield their corners (true depth is re-measured along the
   unperturbed normal, so flat patches carry zero tilt error); rounded
   features yield a single point, with tilted samples naturally rejected by
   the collision threshold. The 10 candidates reduce to <=4 maximizing spread
   (the reference's insertion_point_index heuristic).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import vec
from .common import ATTACH_NONE, gather_points, make_result, reduce_to_4
from .support import Side, edge_dirs, face_axes, support_point, support_projection

TILT = 0.02  # radians-scale tangent tilt for patch sampling


def make_support_kernel(ta: int, tb: int):
    """Factory: returns a kernel(A: Side, B: Side, threshold, axis_validity=None)
    -> ContactResult specialized (at trace time) for the static shape-type
    pair. ``axis_validity(axes_oriented) -> bool mask`` lets callers restrict
    the admissible separating axes (the mesh kernels use it for
    Voronoi-region internal-edge rejection, Design.md:167-171)."""

    def kernel(A: Side, B: Side, threshold, axis_validity=None,
               orient_ref=None):
        """orient_ref [K,3]: direction axes are oriented along instead of the
        center delta (mesh kernels pass the triangle normal — the center
        delta flips under deep penetration, a one-sided surface never does)."""
        K = A.pos.shape[0]
        delta = orient_ref if orient_ref is not None else A.pos - B.pos

        fa, fam = face_axes(ta, A, B.pos)
        fb, fbm = face_axes(tb, B, A.pos)
        ea, eam = edge_dirs(ta, A)
        eb, ebm = edge_dirs(tb, B)
        if ea.shape[1] and eb.shape[1]:
            cr = jnp.cross(ea[:, :, None, :], eb[:, None, :, :])
            cr = cr.reshape(K, -1, 3)
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
        pa_proj = -support_projection(ta, A, -axes)    # min_A proj = -P_A(-n)
        pb_proj = support_projection(tb, B, axes)      # max_B proj
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

        pa_pts = support_point(ta, A, dirs_a)          # [K,5,3]
        pb_pts = support_point(tb, B, dirs_b)

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

        # lateral containment: a candidate is a real closest-proximity point
        # only if it lies inside BOTH shapes' tangent-plane footprint (slab
        # bounds along t1/t2). Without this, a flat feature (e.g. a triangle
        # or large face) contributes its far corners against a small/curved
        # shape — they sit on the support plane (depth ~ sep) but are nowhere
        # near the actual contact. (The reference gets this from per-pair
        # clipping; this is the support-mapped equivalent.)
        tol = 5e-3
        for t in (t1, t2):
            hi_a = support_projection(ta, A, t)
            lo_a = -support_projection(ta, A, -t)
            hi_b = support_projection(tb, B, t)
            lo_b = -support_projection(tb, B, -t)
            lo = jnp.maximum(lo_a, lo_b)[:, None]
            hi = jnp.minimum(hi_a, hi_b)[:, None]
            proj = jnp.sum(on_a * t[:, None, :], -1)
            valid &= (proj >= lo - tol) & (proj <= hi + tol)

        idx4, pv = reduce_to_4(on_a, depth, valid)
        pa4 = gather_points(on_a, idx4)
        pb4 = gather_points(on_b, idx4)
        d4 = gather_points(depth, idx4)
        return make_result(A.pos, A.orn, B.pos, B.orn, pa4, pb4,
                           n[:, None, :], d4, pv,
                           jnp.full((K, 4), ATTACH_NONE, jnp.int32), threshold)

    kernel.__name__ = f"support_sat_{ta}_{tb}"
    return kernel
