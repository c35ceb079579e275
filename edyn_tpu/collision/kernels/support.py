"""Support functions and SAT axis sets per convex shape type.

The reference implements 28 bespoke collide() kernels
(src/edyn/collision/collide/, 5.1k LoC of branchy feature enumeration). The
TPU build keeps bespoke kernels for the highest-traffic pairs (box-box,
anything-plane, sphere pairs) and covers the remaining convex matrix with ONE
generic support-mapped SAT kernel (support_sat.py): every convex shape exposes
an exact support function and a candidate-axis set, which is all SAT needs.
This mirrors the reference's own structure (support_projection per shape,
axis enumeration per pair) but with a uniform, fully batched formulation.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...math import quat, vec
from ...shapes.params import ShapeType
from .common import axis_onehot


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class Side:
    """Gathered per-pair data for one body of each candidate pair."""
    pos: jnp.ndarray      # [K,3]
    orn: jnp.ndarray      # [K,4]
    params: jnp.ndarray   # [K,4]
    # polyhedron side-table rows (zero-size placeholder for other shapes)
    verts: jnp.ndarray        # [K,V,3]
    vert_mask: jnp.ndarray    # [K,V]
    face_normals: jnp.ndarray  # [K,F,3]
    face_mask: jnp.ndarray     # [K,F]
    edge_dirs: jnp.ndarray     # [K,E,3]
    edge_mask: jnp.ndarray     # [K,E]


def support_point(stype: int, side: Side, d):
    """Exact support point of the shape in world space along world unit dir d
    (reference analogue: point_along_dir/support_point_* per shape).
    d: [K,3] or [K,S,3] (sampled dirs)."""
    pos, orn, p = side.pos, side.orn, side.params
    extra = d.ndim - 2  # sampled-axis dims between K and 3
    exp = lambda x: x.reshape(x.shape[:1] + (1,) * extra + x.shape[1:])

    if stype == ShapeType.SPHERE:
        r = exp(p[:, 0:1])
        return exp(pos) + d * r

    if stype == ShapeType.BOX:
        h = exp(p[:, :3])
        dl = quat.rotate_inv(exp(orn), d)
        pt_l = jnp.where(dl >= 0, h, -h)
        return exp(pos) + quat.rotate(exp(orn), pt_l)

    if stype == ShapeType.CAPSULE:
        r = exp(p[:, 0:1])
        hl = exp(p[:, 1:2])
        axis_w = quat.rotate(orn, axis_onehot(p[:, 2]))
        aw = exp(axis_w)
        sgn = jnp.where(vec.dot(aw, d)[..., None] >= 0, 1.0, -1.0)
        return exp(pos) + aw * hl * sgn + d * r

    if stype == ShapeType.CYLINDER:
        r = exp(p[:, 0:1])
        hl = exp(p[:, 1:2])
        axis_w = quat.rotate(orn, axis_onehot(p[:, 2]))
        aw = exp(axis_w)
        ad = vec.dot(aw, d)[..., None]
        sgn = jnp.where(ad >= 0, 1.0, -1.0)
        radial = vec.normalize(d - aw * ad)
        return exp(pos) + aw * hl * sgn + radial * r

    if stype == ShapeType.POLYHEDRON:
        # masked max over padded verts
        vw = quat.rotate(exp(orn)[..., None, :], exp(side.verts)) + exp(pos)[..., None, :]
        proj = jnp.sum(vw * d[..., None, :], -1)
        proj = jnp.where(exp(side.vert_mask), proj, -1e30)
        idx = jnp.argmax(proj, axis=-1)
        return jnp.take_along_axis(vw, idx[..., None, None].repeat(3, -1), -2)[..., 0, :]

    raise NotImplementedError(f"support for shape type {stype}")


def support_projection(stype: int, side: Side, d):
    """max over shape of dot(point, d) (reference: support_projection)."""
    pt = support_point(stype, side, d)
    return jnp.sum(pt * d, -1)


# max counts of candidate axes contributed per shape type (static)
def face_axes(stype: int, side: Side, other_center):
    """Face-normal candidate axes in world space: ([K,F,3], mask[K,F])."""
    K = side.pos.shape[0]
    orn, p = side.orn, side.params
    if stype == ShapeType.SPHERE:
        # sphere contributes the center-delta axis only
        d = vec.normalize_or(other_center - side.pos, jnp.array([0.0, 1.0, 0.0]))
        return d[:, None, :], jnp.ones((K, 1), bool)
    if stype == ShapeType.BOX:
        R = quat.to_matrix(orn)
        return jnp.swapaxes(R, -1, -2), jnp.ones((K, 3), bool)
    if stype in (ShapeType.CAPSULE, ShapeType.CYLINDER):
        axis_w = quat.rotate(orn, axis_onehot(p[:, 2]))
        # cap normal + radial direction toward the other body
        delta = other_center - side.pos
        radial = vec.normalize_or(delta - axis_w * vec.dot(axis_w, delta)[:, None],
                                  vec.orthonormal_basis(axis_w)[0])
        return (jnp.stack([axis_w, radial], axis=1), jnp.ones((K, 2), bool))
    if stype == ShapeType.POLYHEDRON:
        fw = quat.rotate(orn[:, None, :], side.face_normals)
        return fw, side.face_mask
    raise NotImplementedError(stype)


def edge_dirs(stype: int, side: Side):
    """Edge direction set for cross-product axes: ([K,E,3], mask[K,E])."""
    K = side.pos.shape[0]
    orn, p = side.orn, side.params
    if stype == ShapeType.SPHERE:
        return jnp.zeros((K, 0, 3)), jnp.zeros((K, 0), bool)
    if stype == ShapeType.BOX:
        R = quat.to_matrix(orn)
        return jnp.swapaxes(R, -1, -2), jnp.ones((K, 3), bool)
    if stype in (ShapeType.CAPSULE, ShapeType.CYLINDER):
        axis_w = quat.rotate(orn, axis_onehot(p[:, 2]))
        return axis_w[:, None, :], jnp.ones((K, 1), bool)
    if stype == ShapeType.POLYHEDRON:
        ew = quat.rotate(orn[:, None, :], side.edge_dirs)
        return ew, side.edge_mask
    raise NotImplementedError(stype)
