"""Unified convex representation: every convex shape as a padded point cloud
with a radius, plus its SAT face-normal and edge-direction sets.

Rationale (TPU): per-(typeA,typeB) narrowphase buckets cost one kernel
invocation each — 16+ invocations per step — and on TPU the launch overhead
of many small kernels dominates the actual math. With a uniform
support-mapped representation the whole convex-convex matrix runs as ONE
batched kernel (support(d) = max over verts + radius * d + disc_r * |d_perp|),
which is EXACT for spheres (1 vert + r), capsules (2 verts + r), boxes
(8 verts), polyhedra (hull verts) AND cylinders (2 cap centers + a disc term:
the cylinder is the hull of two discs swept around disc_axis, so its support
adds disc_r along the component of d perpendicular to the axis). Rounded
cap-edge (rim) features are classified via circle closest-point candidate
axes in support_sat._rim_axes — the batched analogue of the reference's
closest_point_circle_line / closest_point_circle_circle Newton iterations
(src/edyn/math/geom.cpp:217,476).

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
    disc_r: jnp.ndarray        # [N]   cylinder cap-disc radius (0 otherwise)
    disc_axis: jnp.ndarray     # [N,3] cylinder axis (object space, unit)

    @staticmethod
    def empty(N: int = 1) -> "ConvexTable":
        return ConvexTable(
            verts=jnp.zeros((N, 1, 3)), vert_mask=jnp.zeros((N, 1), bool),
            radius=jnp.zeros((N,)),
            face_normals=jnp.zeros((N, 1, 3)),
            face_mask=jnp.zeros((N, 1), bool),
            edge_dirs=jnp.zeros((N, 1, 3)),
            edge_mask=jnp.zeros((N, 1), bool),
            disc_r=jnp.zeros((N,)),
            disc_axis=jnp.zeros((N, 3)).at[:, 2].set(1.0))


def _axis_vec(axis: int):
    v = np.zeros(3)
    v[axis] = 1.0
    return v


_NO_DISC = (0.0, np.array([0.0, 0.0, 1.0]))


def shape_convex_data(stype: int, params, poly_np=None, poly_index: int = 0):
    """Returns (verts [v,3], radius, face_normals [f,3], edge_dirs [e,3],
    disc_r, disc_axis [3]) in object space for one shape."""
    p = np.asarray(params, np.float64)
    if stype == ShapeType.SPHERE:
        return (np.zeros((1, 3)), float(p[0]), np.zeros((0, 3)),
                np.zeros((0, 3))) + _NO_DISC
    if stype == ShapeType.BOX:
        h = p[:3]
        verts = np.array([[sx * h[0], sy * h[1], sz * h[2]]
                          for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
        eye = np.eye(3)
        return (verts, 0.0, eye, eye) + _NO_DISC
    if stype == ShapeType.CAPSULE:
        r, hl, axis = float(p[0]), float(p[1]), int(p[2])
        a = _axis_vec(axis)
        return (np.stack([a * hl, -a * hl]), r, a[None, :], a[None, :]) + _NO_DISC
    if stype == ShapeType.CYLINDER:
        # EXACT: hull of two radius-r discs at +-hl along the axis. The disc
        # term in the support functions (collision/kernels/support.py) makes
        # side and cap support exact; no polygonal approximation.
        r, hl, axis = float(p[0]), float(p[1]), int(p[2])
        a = _axis_vec(axis)
        verts = np.stack([a * hl, -a * hl])
        return verts, 0.0, a[None, :], a[None, :], r, a
    if stype == ShapeType.POLYHEDRON and poly_np is not None:
        vm = poly_np.vert_mask[poly_index]
        fm = poly_np.face_mask[poly_index]
        em = poly_np.edge_mask[poly_index]
        return (poly_np.verts[poly_index][vm], 0.0,
                poly_np.face_normals[poly_index][fm],
                poly_np.edge_dirs[poly_index][em]) + _NO_DISC
    # NONE / PLANE / MESH: point placeholder (these never enter the unified
    # convex kernel as a convex side)
    return (np.zeros((1, 3)), 0.0, np.zeros((0, 3)), np.zeros((0, 3))) + _NO_DISC


def build_convex_table(shape_types, shape_params, shape_index,
                       poly_np=None, extra_data=None) -> ConvexTable:
    """Bake the per-body table (host-side, at finalize/spawn). ``extra_data``
    appends additional rows (compound children) as (verts, radius, faces,
    edges) tuples past the N body rows."""
    N = len(shape_types)
    data = [shape_convex_data(int(shape_types[i]), shape_params[i], poly_np,
                              int(shape_index[i])) for i in range(N)]
    if extra_data:
        data = data + [d if len(d) == 6 else tuple(d) + _NO_DISC
                       for d in extra_data]
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
    disc_r = np.zeros((NT,), f32)
    disc_ax = np.zeros((NT, 3), f32)
    disc_ax[:, 2] = 1.0
    for i, (v, r, f, e, dr, da) in enumerate(data):
        verts[i, :len(v)] = v
        verts[i, len(v):] = v[0] if len(v) else 0.0  # pad w/ real vertex
        vmask[i, :len(v)] = True
        radius[i] = r
        fnorm[i, :len(f)] = f
        fmask[i, :len(f)] = True
        edirs[i, :len(e)] = e
        emask[i, :len(e)] = True
        disc_r[i] = dr
        disc_ax[i] = da
    return ConvexTable(
        verts=jnp.asarray(verts), vert_mask=jnp.asarray(vmask),
        radius=jnp.asarray(radius),
        face_normals=jnp.asarray(fnorm), face_mask=jnp.asarray(fmask),
        edge_dirs=jnp.asarray(edirs), edge_mask=jnp.asarray(emask),
        disc_r=jnp.asarray(disc_r), disc_axis=jnp.asarray(disc_ax))
