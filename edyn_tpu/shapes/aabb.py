"""Batched world-space AABB computation per shape type.

TPU-native counterpart of the reference's per-shape aabb overloads
(include/edyn/util/aabb_util.hpp:86, src/edyn/util/aabb_util.cpp) and the
``update_aabbs`` system (include/edyn/sys/update_aabbs.hpp). Computes every
simple-shape formula for all bodies and selects by type mask — the formulas
are a handful of FLOPs, so masked evaluation beats gather/scatter bucketing
on the VPU. Polyhedra/compounds/meshes use their padded side tables.

The reference inflates AABBs ("fat AABBs", collision/dynamic_tree.hpp); we
inflate by the same margin so speculative contacts see pairs before touch.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..math import quat
from .params import ShapeType

AABB_MARGIN = 0.01  # matches collision_threshold so speculative pairs are found
PLANE_EXTENT = 1e6


def _axis_onehot(axis_f):
    """axis index (float 0/1/2) -> one-hot [.,3] without branching."""
    a = axis_f[..., None]
    idx = jnp.arange(3.0)
    return jnp.where(jnp.abs(idx - a) < 0.5, 1.0, 0.0)


def compute_aabbs(shape_type, shape_params, pos, orn, poly_table=None,
                  poly_index=None, mesh_table=None, margin=AABB_MARGIN):
    """Returns (aabb_min[N,3], aabb_max[N,3])."""
    R = quat.to_matrix(orn)  # [N,3,3]
    p = shape_params

    # SPHERE: pos +- r
    r_sph = p[..., 0:1]
    ext_sphere = jnp.broadcast_to(r_sph, pos.shape)

    # BOX: |R| @ h
    h = p[..., :3]
    ext_box = jnp.einsum("...ij,...j->...i", jnp.abs(R), h)

    # CAPSULE: |world_axis|*hl + r  (world_axis = R @ e_axis)
    axis_local = _axis_onehot(p[..., 2])
    world_axis = jnp.einsum("...ij,...j->...i", R, axis_local)
    r_c = p[..., 0:1]
    hl = p[..., 1:2]
    ext_capsule = jnp.abs(world_axis) * hl + r_c

    # CYLINDER: hl*|u·e| + r*sqrt(1-(u·e)^2) per world axis e
    u = world_axis
    ue = jnp.abs(u)  # |u·e_k| since e are canonical axes
    ext_cyl = hl * ue + r_c * jnp.sqrt(jnp.clip(1.0 - ue * ue, 0.0, 1.0))

    # PLANE: huge slab (static-only). Use a big box; broadphase filters
    # static-static pairs anyway.
    ext_plane = jnp.full_like(pos, PLANE_EXTENT)

    ext = jnp.full_like(pos, margin)  # NONE / unknown: point + margin
    st = shape_type[..., None]
    ext = jnp.where(st == ShapeType.SPHERE, ext_sphere, ext)
    ext = jnp.where(st == ShapeType.BOX, ext_box, ext)
    ext = jnp.where(st == ShapeType.CAPSULE, ext_capsule, ext)
    ext = jnp.where(st == ShapeType.CYLINDER, ext_cyl, ext)
    ext = jnp.where(st == ShapeType.PLANE, ext_plane, ext)

    amin = pos - ext - margin
    amax = pos + ext + margin

    # POLYHEDRON: rotate padded verts, min/max under mask.
    if poly_table is not None and poly_table.verts.shape[0] > 0:
        pi = jnp.clip(poly_index, 0, poly_table.verts.shape[0] - 1)
        verts = poly_table.verts[pi]                       # [N, MAXV, 3]
        w = jnp.einsum("...ij,...vj->...vi", R, verts) + pos[..., None, :]
        vmask = poly_table.vert_mask[pi][..., None]
        big = 1e30
        pmin = jnp.min(jnp.where(vmask, w, big), axis=-2) - margin
        pmax = jnp.max(jnp.where(vmask, w, -big), axis=-2) + margin
        is_poly = (shape_type == ShapeType.POLYHEDRON)[..., None]
        amin = jnp.where(is_poly, pmin, amin)
        amax = jnp.where(is_poly, pmax, amax)

    # MESH / PAGED_MESH: transform the baked object-space bounds
    if mesh_table is not None and mesh_table.aabb.shape[0] > 0:
        mi = jnp.clip(poly_index, 0, mesh_table.aabb.shape[0] - 1)
        mb = mesh_table.aabb[mi]                            # [N,2,3]
        corners = jnp.stack(
            [jnp.where(jnp.array([(s >> k) & 1 for k in range(3)], bool),
                       mb[..., 1, :], mb[..., 0, :]) for s in range(8)],
            axis=-2)                                        # [N,8,3]
        w = jnp.einsum("...ij,...cj->...ci", R, corners) + pos[..., None, :]
        is_mesh = ((shape_type == ShapeType.MESH)
                   | (shape_type == ShapeType.PAGED_MESH))[..., None]
        amin = jnp.where(is_mesh, jnp.min(w, axis=-2) - margin, amin)
        amax = jnp.where(is_mesh, jnp.max(w, axis=-2) + margin, amax)

    return amin, amax
