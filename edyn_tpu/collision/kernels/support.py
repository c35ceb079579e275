"""Support functions over the unified convex representation.

Every convex shape is a padded point cloud + radius with precomputed SAT
face-normal / edge-direction sets (shapes/convex.py), so support evaluation
is data-driven — no shape-type switching, and the entire convex-convex matrix
runs as ONE kernel invocation (see support_sat.py and the rationale in
shapes/convex.py). Reference analogue: the per-shape support_projection /
point_along_dir routines feeding each collide() kernel.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...math import quat, vec


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class Side:
    """Gathered per-pair data for one body of each candidate pair.
    verts/face_normals/edge_dirs are OBJECT space; kernels rotate on use."""
    pos: jnp.ndarray          # [K,3]
    orn: jnp.ndarray          # [K,4]
    params: jnp.ndarray       # [K,4] raw shape params (plane kernels)
    verts: jnp.ndarray        # [K,V,3]
    vert_mask: jnp.ndarray    # [K,V]
    radius: jnp.ndarray       # [K]
    face_normals: jnp.ndarray  # [K,F,3]
    face_mask: jnp.ndarray     # [K,F]
    edge_dirs: jnp.ndarray     # [K,E,3]
    edge_mask: jnp.ndarray     # [K,E]
    disc_r: jnp.ndarray        # [K]   cylinder cap-disc radius (0 otherwise)
    disc_axis: jnp.ndarray     # [K,3] cylinder axis (object space)

SIDE_FIELDS = ("pos", "orn", "params", "verts", "vert_mask", "radius",
               "face_normals", "face_mask", "edge_dirs", "edge_mask",
               "disc_r", "disc_axis")


def side_map(fn, S: Side) -> Side:
    """Apply fn to every array field (repeat/tile helpers in callers)."""
    return Side(**{f: fn(getattr(S, f)) for f in SIDE_FIELDS})


def pack_side_table(state):
    """[N,C] flattened transform+convex columns so building a bucket's Side
    costs ONE gather per pair side instead of ~11 (launch-overhead-bound
    runtime; see narrowphase.py). Layout: pos 3 | orn 4 | params 4 | radius 1
    | disc_r 1 | disc_axis 3 | verts V*3 | vert_mask V | face_normals F*3
    | face_mask F | edge_dirs E*3 | edge_mask E."""
    cx = state.convex
    N = state.capacity
    Ncx = cx.verts.shape[0]
    V = cx.verts.shape[1]
    F = cx.face_normals.shape[1]
    E = cx.edge_dirs.shape[1]
    f = lambda x: x.astype(jnp.float32)

    def pad(x):
        # the convex table may be shorter than the body capacity (scenes with
        # no plain convex bodies keep a 1-row placeholder); pad so row index
        # == body index
        if Ncx < N:
            return jnp.pad(x, ((0, N - Ncx),) + ((0, 0),) * (x.ndim - 1))
        return x[:N]

    return jnp.concatenate([
        state.origin_pos(), state.orn, state.shape_params, pad(f(cx.radius)[:, None]),
        pad(f(cx.disc_r)[:, None]), pad(f(cx.disc_axis)),
        pad(cx.verts.reshape(Ncx, V * 3)), pad(f(cx.vert_mask)),
        pad(cx.face_normals.reshape(Ncx, F * 3)), pad(f(cx.face_mask)),
        pad(cx.edge_dirs.reshape(Ncx, E * 3)), pad(f(cx.edge_mask)),
    ], axis=1), (V, F, E)


def side_from_packed(g, dims) -> Side:
    """Unpack one gathered [K,C] block back into a Side (slices fuse into the
    consuming kernels — no data movement)."""
    V, F, E = dims
    K = g.shape[0]
    o = [0]

    def cut(n):
        s = g[:, o[0]:o[0] + n]
        o[0] += n
        return s

    pos = cut(3)
    orn = cut(4)
    params = cut(4)
    radius = cut(1)[:, 0]
    disc_r = cut(1)[:, 0]
    disc_axis = cut(3)
    verts = cut(V * 3).reshape(K, V, 3)
    vmask = cut(V) > 0.5
    fn = cut(F * 3).reshape(K, F, 3)
    fmask = cut(F) > 0.5
    ed = cut(E * 3).reshape(K, E, 3)
    emask = cut(E) > 0.5
    return Side(pos=pos, orn=orn, params=params, verts=verts, vert_mask=vmask,
                radius=radius, face_normals=fn, face_mask=fmask,
                edge_dirs=ed, edge_mask=emask,
                disc_r=disc_r, disc_axis=disc_axis)


def world_verts(side: Side):
    """[K,V,3] rotated+translated point cloud."""
    return quat.rotate(side.orn[:, None, :], side.verts) + side.pos[:, None, :]


def world_disc_axis(side: Side):
    """[K,3] cylinder axis in world space."""
    return quat.rotate(side.orn, side.disc_axis)


def _disc_perp(side: Side, d, exp):
    """Component of d perpendicular to the world disc axis and its length.
    Returns (perp [.. ,3], plen [..])."""
    w = exp(world_disc_axis(side))
    dw = jnp.sum(d * w, -1, keepdims=True)
    perp = d - dw * w
    return perp, vec.length(perp)


def support_point(side: Side, d):
    """Exact support point along world unit dir d ([K,3] or [K,S,3]):
    deepest cloud vertex + radius * d + disc_r * normalize(d_perp).

    The disc term makes cylinders exact: the shape is the convex hull of two
    radius-disc_r discs centered at the cap-center verts, so the support point
    offsets radially within the supporting cap plane (reference analogue:
    cylinder_shape support_point, include/edyn/shapes/cylinder_shape.hpp)."""
    extra = d.ndim - 2
    exp = lambda x: x.reshape(x.shape[:1] + (1,) * extra + x.shape[1:])
    vw = world_verts(side)          # [K,V,3]
    vw_e = exp(vw)                  # [K,(1,)*,V,3]
    proj = jnp.sum(vw_e * d[..., None, :], -1)
    proj = jnp.where(exp(side.vert_mask), proj, -1e30)
    idx = jnp.argmax(proj, axis=-1)
    base = jnp.take_along_axis(vw_e, idx[..., None, None].repeat(3, -1), -2)[..., 0, :]
    pt = base + d * exp(side.radius[:, None])
    perp, plen = _disc_perp(side, d, exp)
    disc = exp(side.disc_r[:, None])
    return pt + disc * perp / jnp.maximum(plen[..., None], 1e-12)


def support_projection(side: Side, d):
    """max over shape of dot(point, d). d: [K,3] or [K,S,3]."""
    vw = world_verts(side)
    extra = d.ndim - 2
    exp = lambda x: x.reshape(x.shape[:1] + (1,) * extra + x.shape[1:])
    proj = jnp.sum(exp(vw) * d[..., None, :], -1)
    proj = jnp.where(exp(side.vert_mask), proj, -1e30)
    out = jnp.max(proj, axis=-1) + exp(side.radius[:, None])[..., 0]
    _, plen = _disc_perp(side, d, exp)
    return out + exp(side.disc_r[:, None])[..., 0] * plen


def face_axes(side: Side, other_center):
    """World-space face-normal candidate axes + the center-delta direction
    (covers sphere/capsule radial contact axes) + the cylinder side-face
    normal facing the other body (the radial direction toward the other
    center — the reference's cylinder side feature axis)."""
    fw = quat.rotate(side.orn[:, None, :], side.face_normals)
    d = other_center - side.pos
    delta = vec.normalize_or(d, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]),
                                                 side.pos.shape))
    w = world_disc_axis(side)
    perp = d - jnp.sum(d * w, -1, keepdims=True) * w
    plen = vec.length(perp)
    side_n = perp / jnp.maximum(plen, 1e-12)[..., None]
    side_ok = (side.disc_r > 1e-9) & (plen > 1e-9)
    axes = jnp.concatenate([fw, delta[:, None, :], side_n[:, None, :]], axis=1)
    mask = jnp.concatenate([side.face_mask,
                            jnp.ones((side.pos.shape[0], 1), bool),
                            side_ok[:, None]], axis=1)
    return axes, mask


def edge_dirs(side: Side):
    ew = quat.rotate(side.orn[:, None, :], side.edge_dirs)
    return ew, side.edge_mask
