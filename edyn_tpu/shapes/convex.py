"""Unified convex representation: every convex shape as a padded point cloud
with a radius, plus its SAT face-normal and edge-direction sets.

Rationale (TPU): per-(typeA,typeB) narrowphase buckets cost one kernel
invocation each — 16+ invocations per step — and on TPU the launch overhead
of many small kernels dominates the actual math. With a uniform
support-mapped representation the whole convex-convex matrix runs as ONE
batched kernel (support(d) = max over verts + radius * d), which is exact for
spheres (1 vert + r), capsules (2 verts + r), boxes (8 verts) and polyhedra
(hull verts); cylinders use a 12-gon prism (radial error r*(1-cos(15 deg)) ~
3.4%o — bespoke exact kernels remain for cylinder-vs-plane and raycast).

Reference analogue: the per-shape support_projection/point_along_dir
functions feeding each collide() kernel; here they become one data-driven
table baked at world build (per BODY, so kernels gather one row per pair
side).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .params import ShapeType

NGON = 12  # cylinder rim discretization


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class ConvexTable:
    """Per-body unified convex data (object space)."""
    verts: jnp.ndarray         # [N,V,3]
    vert_mask: jnp.ndarray     # [N,V]
    radius: jnp.ndarray        # [N]
    face_normals: jnp.ndarray  # [N,F,3]
    face_mask: jnp.ndarray     # [N,F]
    edge_dirs: jnp.ndarray     # [N,E,3]
    edge_mask: jnp.ndarray     # [N,E]

    @staticmethod
    def empty(N: int = 1) -> "ConvexTable":
        return ConvexTable(
            verts=jnp.zeros((N, 1, 3)), vert_mask=jnp.zeros((N, 1), bool),
            radius=jnp.zeros((N,)),
            face_normals=jnp.zeros((N, 1, 3)),
            face_mask=jnp.zeros((N, 1), bool),
            edge_dirs=jnp.zeros((N, 1, 3)),
            edge_mask=jnp.zeros((N, 1), bool))


def _axis_vec(axis: int):
    v = np.zeros(3)
    v[axis] = 1.0
    return v


def shape_convex_data(stype: int, params, poly_np=None, poly_index: int = 0):
    """Returns (verts [v,3], radius, face_normals [f,3], edge_dirs [e,3]) in
    object space for one shape."""
    p = np.asarray(params, np.float64)
    if stype == ShapeType.SPHERE:
        return np.zeros((1, 3)), float(p[0]), np.zeros((0, 3)), np.zeros((0, 3))
    if stype == ShapeType.BOX:
        h = p[:3]
        verts = np.array([[sx * h[0], sy * h[1], sz * h[2]]
                          for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
        eye = np.eye(3)
        return verts, 0.0, eye, eye
    if stype == ShapeType.CAPSULE:
        r, hl, axis = float(p[0]), float(p[1]), int(p[2])
        a = _axis_vec(axis)
        return np.stack([a * hl, -a * hl]), r, a[None, :], a[None, :]
    if stype == ShapeType.CYLINDER:
        r, hl, axis = float(p[0]), float(p[1]), int(p[2])
        a = _axis_vec(axis)
        others = [i for i in range(3) if i != axis]
        u = _axis_vec(others[0])
        v = _axis_vec(others[1])
        ang = np.arange(NGON) * (2 * np.pi / NGON)
        rim = (np.cos(ang)[:, None] * u + np.sin(ang)[:, None] * v) * r
        verts = np.concatenate([rim + a * hl, rim - a * hl])
        # unique normals: axis + side-face normals (between adjacent rim verts)
        half = ang + np.pi / NGON
        sides = np.cos(half)[:, None] * u + np.sin(half)[:, None] * v
        faces = np.concatenate([a[None, :], sides])
        # edge dirs: axis + rim edge directions
        rim_dirs = rim[(np.arange(NGON) + 1) % NGON] - rim
        rim_dirs /= np.linalg.norm(rim_dirs, axis=1, keepdims=True)
        edges = np.concatenate([a[None, :], rim_dirs])
        return verts, 0.0, faces, edges
    if stype == ShapeType.POLYHEDRON and poly_np is not None:
        vm = poly_np.vert_mask[poly_index]
        fm = poly_np.face_mask[poly_index]
        em = poly_np.edge_mask[poly_index]
        return (poly_np.verts[poly_index][vm], 0.0,
                poly_np.face_normals[poly_index][fm],
                poly_np.edge_dirs[poly_index][em])
    # NONE / PLANE / MESH: point placeholder (these never enter the unified
    # convex kernel as a convex side)
    return np.zeros((1, 3)), 0.0, np.zeros((0, 3)), np.zeros((0, 3))


def build_convex_table(shape_types, shape_params, shape_index,
                       poly_np=None, extra_data=None) -> ConvexTable:
    """Bake the per-body table (host-side, at finalize/spawn). ``extra_data``
    appends additional rows (compound children) as (verts, radius, faces,
    edges) tuples past the N body rows."""
    N = len(shape_types)
    data = [shape_convex_data(int(shape_types[i]), shape_params[i], poly_np,
                              int(shape_index[i])) for i in range(N)]
    if extra_data:
        data = data + list(extra_data)
    NT = len(data)
    V = max(max((len(d[0]) for d in data), default=1), 1)
    F = max(max((len(d[2]) for d in data), default=1), 1)
    E = max(max((len(d[3]) for d in data), default=1), 1)
    f32 = np.float32
    verts = np.zeros((NT, V, 3), f32)
    vmask = np.zeros((NT, V), bool)
    radius = np.zeros((NT,), f32)
    fnorm = np.zeros((NT, F, 3), f32)
    fmask = np.zeros((NT, F), bool)
    edirs = np.zeros((NT, E, 3), f32)
    emask = np.zeros((NT, E), bool)
    for i, (v, r, f, e) in enumerate(data):
        verts[i, :len(v)] = v
        verts[i, len(v):] = v[0] if len(v) else 0.0  # pad w/ real vertex
        vmask[i, :len(v)] = True
        radius[i] = r
        fnorm[i, :len(f)] = f
        fmask[i, :len(f)] = True
        edirs[i, :len(e)] = e
        emask[i, :len(e)] = True
    return ConvexTable(
        verts=jnp.asarray(verts), vert_mask=jnp.asarray(vmask),
        radius=jnp.asarray(radius),
        face_normals=jnp.asarray(fnorm), face_mask=jnp.asarray(fmask),
        edge_dirs=jnp.asarray(edirs), edge_mask=jnp.asarray(emask))
