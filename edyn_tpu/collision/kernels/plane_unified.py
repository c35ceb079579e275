"""Unified convex-vs-plane kernel: cloud vertices (+radius, +disc rim)
below the plane become contact candidates, reduced to the best 4. Exact for
spheres, boxes, capsules, polyhedra AND cylinders (replaces the per-type
*_plane kernels — collide_sphere_plane.cpp, collide_box_plane.cpp,
collide_capsule_plane.cpp, collide_polyhedron_plane.cpp,
collide_cylinder_plane.cpp — in ONE invocation).

Cylinder handling: each cap-center vertex emits 4 rim candidates
cap + disc_r * (cos t * e1 + sin t * e2), where e1 is the in-cap direction
deepest into the plane and e2 = axis x e1. Tilted cylinders get the exact
deepest rim point at t=0 (the reference's cylinder-plane feature math);
flat-resting caps get a 4-point ring spanning the disc (the reference emits
the same ring for the face-parallel case)."""
from __future__ import annotations

import jax.numpy as jnp

from ...math import quat, vec
from .common import ATTACH_B, gather_points, make_result, reduce_to_4
from .support import Side, world_disc_axis, world_verts


def collide_convex_plane(A: Side, B: Side, threshold):
    """A = unified convex body, B = plane body (params = object-space
    normal + constant)."""
    K = A.pos.shape[0]
    n = quat.rotate(B.orn, B.params[:, :3])
    c = B.params[:, 3] + vec.dot(n, B.pos)
    vw = world_verts(A)                                   # [K,V,3]
    r = A.radius[:, None]
    surf = vw - n[:, None, :] * r[..., None]              # sphere-swept offset
    cand = surf
    cand_valid = A.vert_mask

    has_disc = A.disc_r > 1e-9
    if True:  # disc rim candidates (masked out for non-cylinders)
        w = world_disc_axis(A)                            # [K,3]
        perp = -n - jnp.sum(-n * w, -1, keepdims=True) * w
        t1, _ = vec.orthonormal_basis(w)
        e1 = vec.normalize_or(perp, t1)                   # deepest in-cap dir
        e2 = vec.cross(w, e1)
        dr = A.disc_r[:, None, None]
        rim = jnp.stack([
            vw + dr * e1[:, None, :],
            vw - dr * e1[:, None, :],
            vw + dr * e2[:, None, :],
            vw - dr * e2[:, None, :],
        ], axis=2).reshape(K, -1, 3)                      # [K,4V,3]
        rim_valid = (A.vert_mask & has_disc[:, None])[:, :, None].repeat(
            4, axis=2).reshape(K, -1)
        cand = jnp.concatenate([cand, rim], axis=1)
        cand_valid = jnp.concatenate([cand_valid & ~has_disc[:, None],
                                      rim_valid], axis=1)

    dist = vec.dot(cand, n[:, None, :]) - c[:, None]
    cand_valid = cand_valid & (dist < threshold)
    idx, pv = reduce_to_4(cand, dist, cand_valid)
    pa_w = gather_points(cand, idx)
    d4 = gather_points(dist, idx)
    pb_w = pa_w - n[:, None, :] * d4[..., None]
    return make_result(A.pos, A.orn, B.pos, B.orn, pa_w, pb_w,
                       n[:, None, :], d4, pv,
                       jnp.full(d4.shape, ATTACH_B, jnp.int32), threshold)
