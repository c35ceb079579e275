"""Polyhedron vs plane (reference:
src/edyn/collision/collide/collide_polyhedron_plane.cpp): vertices below the
plane become candidates, reduced to the best 4."""
from __future__ import annotations

import jax.numpy as jnp

from ...math import quat, vec
from .common import ATTACH_B, gather_points, make_result, reduce_to_4
from .support import Side


def collide_polyhedron_plane(A: Side, B: Side, threshold):
    n = quat.rotate(B.orn, B.params[:, :3])
    c = B.params[:, 3] + vec.dot(n, B.pos)
    vw = quat.rotate(A.orn[:, None, :], A.verts) + A.pos[:, None, :]  # [K,V,3]
    dist = vec.dot(vw, n[:, None, :]) - c[:, None]
    cand_valid = A.vert_mask & (dist < threshold)
    idx, pv = reduce_to_4(vw, dist, cand_valid)
    pa_w = gather_points(vw, idx)
    d4 = gather_points(dist, idx)
    pb_w = pa_w - n[:, None, :] * d4[..., None]
    return make_result(A.pos, A.orn, B.pos, B.orn, pa_w, pb_w,
                       n[:, None, :], d4, pv,
                       jnp.full(d4.shape, ATTACH_B, jnp.int32), threshold)
