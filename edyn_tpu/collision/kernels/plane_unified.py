"""Unified convex-vs-plane kernel: cloud vertices (+radius) below the plane
become contact candidates, reduced to the best 4. Exact for spheres, boxes,
capsules and polyhedra (replaces the per-type *_plane kernels in one
invocation; reference: collide_sphere_plane.cpp, collide_box_plane.cpp,
collide_capsule_plane.cpp, collide_polyhedron_plane.cpp). Cylinders keep
their bespoke exact rim kernel."""
from __future__ import annotations

import jax.numpy as jnp

from ...math import quat, vec
from .common import ATTACH_B, gather_points, make_result, reduce_to_4
from .support import Side, world_verts


def collide_convex_plane(A: Side, B: Side, threshold):
    """A = unified convex body, B = plane body (params = object-space
    normal + constant)."""
    n = quat.rotate(B.orn, B.params[:, :3])
    c = B.params[:, 3] + vec.dot(n, B.pos)
    vw = world_verts(A)                                   # [K,V,3]
    r = A.radius[:, None]
    dist = vec.dot(vw, n[:, None, :]) - c[:, None] - r
    cand_valid = A.vert_mask & (dist < threshold)
    surf = vw - n[:, None, :] * r[..., None]              # point on A's surface
    idx, pv = reduce_to_4(surf, dist, cand_valid)
    pa_w = gather_points(surf, idx)
    d4 = gather_points(dist, idx)
    pb_w = pa_w - n[:, None, :] * d4[..., None]
    return make_result(A.pos, A.orn, B.pos, B.orn, pa_w, pb_w,
                       n[:, None, :], d4, pv,
                       jnp.full(d4.shape, ATTACH_B, jnp.int32), threshold)
