"""Compound-shape narrowphase: expand children, run the unified kernels, fold.

Reference: collide_compound_* (src/edyn/collision/collide/
collide_compound_compound.cpp etc.) recursing into children via the
compound's static tree. Here each (compound, other) pair expands into
(child, other) sub-pairs — same pattern as the mesh kernel's triangles — and
the sub-results fold back to the best <=4 points per pair.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import quat
from .common import ContactResult, gather_points, reduce_to_4
from .plane_unified import collide_convex_plane
from .support import Side
from .support_sat import collide_support


def _expand_children(state, body_idx, reps_other=1):
    """Side over the flattened children of compound bodies [K] ->
    [K*CH(*reps_other)]: child convex rows with composed world transforms."""
    ct = state.compound
    cx = state.convex
    ci = jnp.clip(state.shape_index[body_idx], 0,
                  max(ct.child_row.shape[0] - 1, 0))
    rows = ct.child_row[ci]                    # [K,CH]
    mask = ct.child_mask[ci]
    K, CH = rows.shape
    rows_c = jnp.maximum(rows, 0)

    pos_b = state.origin_pos()[body_idx]
    orn_b = state.orn[body_idx]
    pos_w = pos_b[:, None, :] + quat.rotate(orn_b[:, None, :], ct.child_pos[ci])
    orn_w = quat.mul(orn_b[:, None, :], ct.child_orn[ci])

    F = K * CH
    flat = lambda x: x.reshape((F,) + x.shape[2:])
    r = flat(rows_c)
    side = Side(
        pos=flat(pos_w), orn=flat(orn_w),
        params=jnp.zeros((F, 4)),
        verts=cx.verts[r], vert_mask=cx.vert_mask[r] & flat(mask)[:, None],
        radius=cx.radius[r],
        face_normals=cx.face_normals[r], face_mask=cx.face_mask[r],
        edge_dirs=cx.edge_dirs[r], edge_mask=cx.edge_mask[r],
        disc_r=cx.disc_r[r], disc_axis=cx.disc_axis[r])
    return side, flat(mask), CH


def _rep_side(S: Side, n: int) -> Side:
    from .support import side_map
    return side_map(lambda x: jnp.repeat(x, n, axis=0), S)


def _fold(res: ContactResult, sub_valid, K, SUB, A_body: Side, B_body: Side,
          sub_A: Side, sub_B: Side):
    """Fold [K*SUB] sub-results into [K] body-frame results."""
    pv = res.point_valid & sub_valid[:, None]
    on_a_w = sub_A.pos[:, None, :] + quat.rotate(sub_A.orn[:, None, :],
                                                 res.pivot_a)
    on_b_w = sub_B.pos[:, None, :] + quat.rotate(sub_B.orn[:, None, :],
                                                 res.pivot_b)
    C4 = SUB * 4
    idx4, pv4 = reduce_to_4(on_a_w.reshape(K, C4, 3),
                            res.distance.reshape(K, C4),
                            pv.reshape(K, C4))
    take = lambda x: gather_points(x.reshape((K, C4) + x.shape[2:]), idx4)
    pa_w = take(on_a_w)
    pb_w = take(on_b_w)
    return ContactResult(
        point_valid=pv4,
        pivot_a=quat.rotate_inv(A_body.orn[:, None, :],
                                pa_w - A_body.pos[:, None, :]),
        pivot_b=quat.rotate_inv(B_body.orn[:, None, :],
                                pb_w - B_body.pos[:, None, :]),
        normal=take(res.normal),
        distance=take(res.distance),
        attachment=jnp.zeros((K, 4), jnp.int32),
        friction_scale=take(res.friction_scale),
        restitution_scale=take(res.restitution_scale),
    )


def collide_compound_convex(state, ka, kb, A: Side, B: Side, threshold):
    """A = compound body, B = unified convex body."""
    K = A.pos.shape[0]
    sub_A, mask, CH = _expand_children(state, ka)
    sub_B = _rep_side(B, CH)
    res = collide_support(sub_A, sub_B, threshold)
    return _fold(res, mask, K, CH, A, B, sub_A, sub_B)


def collide_compound_plane(state, ka, kb, A: Side, B: Side, threshold):
    K = A.pos.shape[0]
    sub_A, mask, CH = _expand_children(state, ka)
    sub_B = _rep_side(B, CH)
    res = collide_convex_plane(sub_A, sub_B, threshold)
    return _fold(res, mask, K, CH, A, B, sub_A, sub_B)


def collide_compound_mesh(state, ka, kb, A: Side, B: Side, threshold,
                          rim_axes: bool = False):
    """A = compound body, B = static triangle-mesh body (reference:
    collide_compound_mesh, src/edyn/collision/collide/collide_compound_mesh.cpp
    — per-child recursion into the trimesh). Children expand exactly like
    compound-vs-convex, then each (child, mesh) sub-pair runs the unified
    convex-vs-mesh kernel and the sub-results fold back to <=4 points."""
    from .mesh import collide_convex_mesh
    K = A.pos.shape[0]
    sub_A, mask, CH = _expand_children(state, ka)
    sub_B = _rep_side(B, CH)
    mesh_idx = jnp.repeat(state.shape_index[kb], CH, axis=0)
    res = collide_convex_mesh(sub_A, sub_B, threshold,
                              mesh_table=state.mesh, mesh_index=mesh_idx,
                              rim_axes=rim_axes)
    return _fold(res, mask, K, CH, A, B, sub_A, sub_B)


def collide_compound_compound(state, ka, kb, A: Side, B: Side, threshold):
    K = A.pos.shape[0]
    sub_A, mask_a, CHA = _expand_children(state, ka)
    sub_B, mask_b, CHB = _expand_children(state, kb)
    # [K*CHA] x [K*CHB] -> [K*CHA*CHB]
    repA = _rep_side(sub_A, CHB)
    mask_a_r = jnp.repeat(mask_a, CHB, axis=0)
    # tile B's children per A child: reshape to [K, CHB, ...] then tile CHA
    tile = lambda x: jnp.repeat(
        x.reshape((K, CHB) + x.shape[1:]), CHA, axis=0).reshape(
            (K * CHA * CHB,) + x.shape[1:])
    from .support import side_map
    tileB = side_map(tile, sub_B)
    mask_b_t = tile(mask_b)
    res = collide_support(repA, tileB, threshold)
    return _fold(res, mask_a_r & mask_b_t, K, CHA * CHB, A, B, repA, tileB)
