"""Batched world-space AABB computation.

TPU-native counterpart of the reference's per-shape aabb overloads
(include/edyn/util/aabb_util.hpp:86, src/edyn/util/aabb_util.cpp) and the
``update_aabbs`` system (include/edyn/sys/update_aabbs.hpp). With the unified
convex representation (shapes/convex.py) every convex shape's AABB is the
same program — rotate the padded cloud, masked min/max, inflate by radius —
one fused op chain for the whole world instead of per-type formulas. Planes
(infinite slabs) and meshes (baked object-space bounds) are special-cased.

The reference inflates AABBs ("fat AABBs", collision/dynamic_tree.hpp); we
inflate by the same margin so speculative contacts see pairs before touch.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..math import quat
from .params import ShapeType

AABB_MARGIN = 0.01  # matches collision_threshold so speculative pairs are found
PLANE_EXTENT = 1e6
BIG = 1e30


def compute_aabbs(shape_type, shape_params, pos, orn, poly_table=None,
                  shape_index=None, mesh_table=None, convex_table=None,
                  margin=AABB_MARGIN):
    """Returns (aabb_min[N,3], aabb_max[N,3])."""
    st = shape_type[..., None]

    # unified convex path: rotate cloud, masked min/max, +radius
    # (the convex table may carry extra rows for compound children — body
    # rows are the first N)
    cx = convex_table
    N = pos.shape[0]
    vw = quat.rotate(orn[..., None, :], cx.verts[:N]) + pos[..., None, :]
    vmask = cx.vert_mask[:N][..., None]
    radius = cx.radius[:N]
    amin = jnp.min(jnp.where(vmask, vw, BIG), axis=-2) - radius[..., None]
    amax = jnp.max(jnp.where(vmask, vw, -BIG), axis=-2) + radius[..., None]
    # cylinder cap discs: a disc of radius disc_r with world axis w extends
    # disc_r*sqrt(1-w_k^2) along coordinate axis k (omitting this gave
    # cylinders hairline AABBs — masked by the plane's world-sized slab until
    # halfspace pairing made the cylinder's own AABB authoritative)
    disc_r = cx.disc_r[:N]
    w_ax = quat.rotate(orn, cx.disc_axis[:N])
    disc_ext = disc_r[..., None] * jnp.sqrt(
        jnp.clip(1.0 - w_ax * w_ax, 0.0, 1.0))
    amin = amin - disc_ext
    amax = amax + disc_ext
    # bodies with no cloud (NONE): point at pos
    has_cloud = jnp.any(cx.vert_mask[:N], axis=-1)[..., None]
    amin = jnp.where(has_cloud, amin, pos)
    amax = jnp.where(has_cloud, amax, pos)

    # PLANE: huge slab (static-only)
    is_plane = st == ShapeType.PLANE
    amin = jnp.where(is_plane, pos - PLANE_EXTENT, amin)
    amax = jnp.where(is_plane, pos + PLANE_EXTENT, amax)

    # MESH / PAGED_MESH: transform the baked object-space bounds
    if mesh_table is not None and mesh_table.aabb.shape[0] > 0:
        mi = jnp.clip(shape_index, 0, mesh_table.aabb.shape[0] - 1)
        mb = mesh_table.aabb[mi]                            # [N,2,3]
        corners = jnp.stack(
            [jnp.where(jnp.array([(s >> k) & 1 for k in range(3)], bool),
                       mb[..., 1, :], mb[..., 0, :]) for s in range(8)],
            axis=-2)                                        # [N,8,3]
        R = quat.to_matrix(orn)
        w = jnp.einsum("...ij,...cj->...ci", R, corners) + pos[..., None, :]
        is_mesh = ((shape_type == ShapeType.MESH)
                   | (shape_type == ShapeType.PAGED_MESH))[..., None]
        amin = jnp.where(is_mesh, jnp.min(w, axis=-2), amin)
        amax = jnp.where(is_mesh, jnp.max(w, axis=-2), amax)

    return amin - margin, amax + margin
