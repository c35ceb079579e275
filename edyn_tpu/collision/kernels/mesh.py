"""Convex-shape vs triangle-mesh narrowphase (ONE kernel for all convex types
via the unified convex representation).

Reference: the *_mesh collide kernels (src/edyn/collision/collide/
collide_sphere_mesh.cpp … collide_polyhedron_mesh.cpp) walking the trimesh BVH
per pair, with Voronoi-region internal-edge rejection (Design.md:167-171).

TPU formulation: each (convex body, mesh) pair gathers its [CAP] candidate
triangles from the baked cell grid (shapes/mesh.py), every triangle becomes a
3-vertex cloud Side, and the unified support-SAT kernel runs over the
flattened [K*CAP] (shape, triangle) pairs.

Internal-edge rejection happens BEFORE axis selection (as in the reference):
a candidate separating axis is admissible only if it lies inside the Voronoi
wedge of the triangle feature it selects — face features demand the triangle
normal, edge features allow normals up to the adjacent face's normal,
vertices the loosest of their edges. A lone triangle's true
minimum-translation axis often points across an interior edge (valid for the
triangle, wrong for the surface); this pre-filter forces SAT onto the
surface-consistent axis instead.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import quat, vec
from ...shapes.mesh import candidate_tris
from .common import ContactResult, gather_points, reduce_to_4
from .support import Side
from .support_sat import collide_support

VORONOI_TOL = 0.01
FACE_COS = 0.999


def collide_convex_mesh(A: Side, B: Side, threshold, mesh_table=None,
                        mesh_index=None, rim_axes: bool = True):
    """A = unified convex body, B = static mesh body."""
    assert mesh_table is not None
    K = A.pos.shape[0]
    CAP = mesh_table.grid.shape[-1]
    mi = jnp.clip(mesh_index, 0, max(mesh_table.tri_verts.shape[0] - 1, 0))

    # body center in mesh object space -> candidate triangle ids
    c_local = quat.rotate_inv(B.orn, A.pos - B.pos)
    ids = candidate_tris(mesh_table, mi, c_local)          # [K,CAP]
    ids_ok = ids >= 0
    ids_c = jnp.maximum(ids, 0)

    tv = mesh_table.tri_verts[mi[:, None], ids_c]          # [K,CAP,3,3]
    tn = mesh_table.tri_normal[mi[:, None], ids_c]         # [K,CAP,3]
    adj = mesh_table.adj_normal[mi[:, None], ids_c]        # [K,CAP,3,3]
    ids_ok &= mesh_table.tri_mask[mi[:, None], ids_c]

    # to world space
    tv_w = quat.rotate(B.orn[:, None, None, :], tv) + B.pos[:, None, None, :]
    tn_w = quat.rotate(B.orn[:, None, :], tn)
    adj_w = quat.rotate(B.orn[:, None, None, :], adj)

    F = K * CAP
    tv_f = tv_w.reshape(F, 3, 3)
    tn_f = tn_w.reshape(F, 3)
    adj_f = adj_w.reshape(F, 3, 3)
    cent = tv_f.mean(axis=1)
    rep = lambda x: jnp.repeat(x, CAP, axis=0)
    ident = jnp.zeros((F, 4)).at[:, 3].set(1.0)
    tri_side = Side(
        pos=cent, orn=ident, params=jnp.zeros((F, 4)),
        verts=tv_f - cent[:, None, :],
        vert_mask=jnp.ones((F, 3), bool),
        radius=jnp.zeros((F,)),
        face_normals=tn_f[:, None, :],
        face_mask=jnp.ones((F, 1), bool),
        edge_dirs=_edge_dirs(tv_f),
        edge_mask=jnp.ones((F, 3), bool),
        disc_r=jnp.zeros((F,)),
        disc_axis=jnp.zeros((F, 3)).at[:, 2].set(1.0),
    )
    from .support import side_map
    A_rep = side_map(rep, A)

    # admissible-axis filter: Voronoi wedge of the triangle support feature
    cos_adj = vec.dot(adj_f, tn_f[:, None, :])             # [F,3] per edge
    vert_bound = jnp.stack([
        jnp.minimum(cos_adj[:, 0], cos_adj[:, 2]),   # v0: edges 01, 20
        jnp.minimum(cos_adj[:, 0], cos_adj[:, 1]),   # v1: edges 01, 12
        jnp.minimum(cos_adj[:, 1], cos_adj[:, 2]),   # v2: edges 12, 20
    ], -1)

    def axis_validity(axes):                                # [F,X,3]
        cosn = jnp.einsum("fxd,fd->fx", axes, tn_f)
        proj = jnp.einsum("fvd,fxd->fxv", tv_f, axes)       # [F,X,3verts]
        maxp = jnp.max(proj, axis=-1, keepdims=True)
        m = proj >= maxp - 1e-5                             # support verts
        count = jnp.sum(m, axis=-1)
        e0 = m[..., 0] & m[..., 1]
        e1 = m[..., 1] & m[..., 2]
        edge_b = jnp.where(e0, cos_adj[:, None, 0],
                           jnp.where(e1, cos_adj[:, None, 1],
                                     cos_adj[:, None, 2]))
        vert_b = jnp.where(m[..., 0], vert_bound[:, None, 0],
                           jnp.where(m[..., 1], vert_bound[:, None, 1],
                                     vert_bound[:, None, 2]))
        bound = jnp.where(count >= 3, FACE_COS,
                          jnp.where(count == 2, edge_b, vert_b))
        ok = (cosn >= bound - VORONOI_TOL) | (cosn >= FACE_COS)
        return ok & (cosn > 0.0)

    res = collide_support(A_rep, tri_side, threshold,
                          axis_validity=axis_validity,
                          orient_ref=tn_f, clamp_flat=False,
                          rim_axes=rim_axes)  # [F,4]
    pv = res.point_valid & ids_ok.reshape(F)[:, None]
    pv &= vec.dot(res.normal, tn_f[:, None, :]) > 0.0

    p_on_tri = cent[:, None, :] + res.pivot_b               # identity orn
    on_a_w = A_rep.pos[:, None, :] + quat.rotate(A_rep.orn[:, None, :],
                                                 res.pivot_a)

    # fold CAP triangles' candidates into <=4 points per (body, mesh) pair
    C4 = CAP * 4
    idx4, pv4 = reduce_to_4(on_a_w.reshape(K, C4, 3),
                            res.distance.reshape(K, C4),
                            pv.reshape(K, C4))
    take = lambda x: gather_points(x.reshape((K, C4) + x.shape[2:]), idx4)
    # per-triangle material scale rides each point (Design.md:199-203)
    tri_fr = jnp.repeat(mesh_table.tri_friction[mi[:, None], ids_c], 4, axis=1)
    tri_re = jnp.repeat(mesh_table.tri_restitution[mi[:, None], ids_c], 4,
                        axis=1)
    return ContactResult(
        point_valid=pv4,
        pivot_a=take(res.pivot_a),
        pivot_b=quat.rotate_inv(B.orn[:, None, :],
                                take(p_on_tri) - B.pos[:, None, :]),
        normal=take(res.normal),
        distance=take(res.distance),
        attachment=jnp.full((K, 4), 0, jnp.int32),
        friction_scale=gather_points(tri_fr, idx4),
        restitution_scale=gather_points(tri_re, idx4),
    )


collide_convex_mesh.needs_mesh = True


def make_mesh_kernel(ta: int = -1):
    """Back-compat factory (data-driven; type arg ignored)."""
    return collide_convex_mesh


def _edge_dirs(tv):
    """[F,3,3] triangle verts -> [F,3,3] unit edge directions."""
    e0 = tv[:, 1] - tv[:, 0]
    e1 = tv[:, 2] - tv[:, 1]
    e2 = tv[:, 0] - tv[:, 2]
    e = jnp.stack([e0, e1, e2], axis=1)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
