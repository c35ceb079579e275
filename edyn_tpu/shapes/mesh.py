"""Static triangle meshes (concave terrain).

Reference: triangle_mesh (include/edyn/shapes/triangle_mesh.hpp:1-261) — a
static BVH over triangles with edge-adjacency normals for Voronoi-region
internal-edge rejection (Design.md:167-171) and per-vertex materials
(Design.md:199-203).

TPU-native design: the BVH becomes a dense 2D cell grid over the mesh's
dominant plane, baked host-side — every triangle is registered (with margin)
in every cell it overlaps, so a body's narrowphase candidates are ONE gather
``grid[cell] -> [CAP] triangle ids`` (no tree walk, no data-dependent
control flow). Triangle geometry is stored pre-gathered per triangle
(verts/normal/edge-adjacent normals) so kernels never chase indices.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class MeshTable:
    """Padded SoA over all mesh shapes in a world."""
    tri_verts: jnp.ndarray    # [NM, MAXT, 3, 3]
    tri_normal: jnp.ndarray   # [NM, MAXT, 3]
    adj_normal: jnp.ndarray   # [NM, MAXT, 3, 3] neighbor normal per edge (own if boundary)
    tri_mask: jnp.ndarray     # [NM, MAXT]
    tri_friction: jnp.ndarray    # [NM, MAXT] per-triangle material scale
    tri_restitution: jnp.ndarray  # [NM, MAXT]
    aabb: jnp.ndarray         # [NM, 2, 3] object-space bounds
    # 2D candidate grid over (u, v) axes
    grid: jnp.ndarray         # [NM, GX, GY, CAP] int32 tri ids (-1 pad)
    grid_origin: jnp.ndarray  # [NM, 2]
    grid_cell: jnp.ndarray    # [NM] cell size
    grid_axes: jnp.ndarray    # [NM, 2] int32 which coordinate axes form the grid

    @staticmethod
    def empty() -> "MeshTable":
        z = jnp.zeros
        return MeshTable(
            tri_verts=z((0, 1, 3, 3)), tri_normal=z((0, 1, 3)),
            adj_normal=z((0, 1, 3, 3)), tri_mask=z((0, 1), bool),
            tri_friction=z((0, 1)), tri_restitution=z((0, 1)),
            aabb=z((0, 2, 3)),
            grid=z((0, 1, 1, 1), jnp.int32), grid_origin=z((0, 2)),
            grid_cell=z((0,)), grid_axes=z((0, 2), jnp.int32))


def preprocess_trimesh(vertices: np.ndarray, indices: np.ndarray,
                       vertex_friction: np.ndarray | None = None,
                       vertex_restitution: np.ndarray | None = None):
    """Host-side preprocessing: per-tri verts/normals, edge adjacency normals
    (reference: triangle_mesh::initialize + calculate_adjacent_normals), and
    per-tri material from per-vertex values (reference per-vertex materials).

    Uses the native C++ helper when built (csrc/edyn_native), else numpy."""
    from ..native import loader
    vertices = np.asarray(vertices, np.float64)
    indices = np.asarray(indices, np.int64)
    T = len(indices)
    tv = vertices[indices]                       # [T,3,3]
    n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(ln, 1e-12)

    native = loader.lib()
    if native is not None:
        adj = loader.adjacent_normals(indices, n)
    else:
        edge_map: dict[tuple, list] = {}
        for t, tri in enumerate(indices):
            for e in range(3):
                a, b = int(tri[e]), int(tri[(e + 1) % 3])
                edge_map.setdefault((min(a, b), max(a, b)), []).append((t, e))
        adj = np.repeat(n[:, None, :], 3, axis=1)    # default: own normal
        for _, users in edge_map.items():
            if len(users) == 2:
                (t0, e0), (t1, e1) = users
                adj[t0, e0] = n[t1]
                adj[t1, e1] = n[t0]

    if vertex_friction is not None:
        fr = np.asarray(vertex_friction)[indices].mean(axis=1)
    else:
        fr = np.ones(T)
    if vertex_restitution is not None:
        re = np.asarray(vertex_restitution)[indices].mean(axis=1)
    else:
        re = np.ones(T)
    return tv, n, adj, fr, re


def build_grid(tv: np.ndarray, cell_size: float | None = None, cap: int = 64,
               margin: float = 0.5):
    """Bake the 2D candidate grid: triangles registered in every overlapped
    cell of the dominant plane."""
    lo = tv.reshape(-1, 3).min(axis=0)
    hi = tv.reshape(-1, 3).max(axis=0)
    extent = hi - lo
    up = int(np.argmin(extent))          # thinnest axis = height axis
    axes = [a for a in range(3) if a != up]
    if cell_size is None:
        area = max(extent[axes[0]] * extent[axes[1]], 1e-6)
        cell_size = max(np.sqrt(area / max(len(tv), 1)) * 2.0, 1e-3)
    gx = max(1, int(np.ceil(extent[axes[0]] / cell_size)) + 1)
    gy = max(1, int(np.ceil(extent[axes[1]] / cell_size)) + 1)
    origin = np.array([lo[axes[0]], lo[axes[1]]])

    from ..native import loader
    if loader.lib() is not None:
        grid, overflow = loader.bake_grid(tv, axes[0], axes[1], origin,
                                          cell_size, margin, gx, gy, cap)
    else:
        cells: dict[tuple, list] = {}
        for t, tri in enumerate(tv):
            tlo = tri.min(axis=0) - margin
            thi = tri.max(axis=0) + margin
            x0 = int((tlo[axes[0]] - lo[axes[0]]) // cell_size)
            x1 = int((thi[axes[0]] - lo[axes[0]]) // cell_size)
            y0 = int((tlo[axes[1]] - lo[axes[1]]) // cell_size)
            y1 = int((thi[axes[1]] - lo[axes[1]]) // cell_size)
            for cx in range(max(0, x0), min(gx - 1, x1) + 1):
                for cy in range(max(0, y0), min(gy - 1, y1) + 1):
                    cells.setdefault((cx, cy), []).append(t)
        overflow = max((max(len(v) - cap, 0) for v in cells.values()), default=0)
        grid = np.full((gx, gy, cap), -1, np.int32)
        for (cx, cy), tris in cells.items():
            grid[cx, cy, :min(len(tris), cap)] = tris[:cap]
    return grid, origin, float(cell_size), np.array(axes, np.int32), \
        (lo, hi), overflow


def pack_meshes(mesh_shapes: list, cap: int = 64) -> MeshTable:
    """Build the padded MeshTable from MeshShape descriptors."""
    if not mesh_shapes:
        return MeshTable.empty()
    pre = []
    for m in mesh_shapes:
        tv, n, adj, fr, re = preprocess_trimesh(
            m.vertices, m.indices,
            getattr(m, "vertex_friction", None),
            getattr(m, "vertex_restitution", None))
        grid, origin, cell, axes, bounds, _ = build_grid(tv, cap=cap)
        pre.append((tv, n, adj, fr, re, grid, origin, cell, axes, bounds))

    NM = len(pre)
    MAXT = max(len(p[0]) for p in pre)
    GX = max(p[5].shape[0] for p in pre)
    GY = max(p[5].shape[1] for p in pre)
    f32 = np.float32
    tri_verts = np.zeros((NM, MAXT, 3, 3), f32)
    tri_normal = np.zeros((NM, MAXT, 3), f32)
    adj_normal = np.zeros((NM, MAXT, 3, 3), f32)
    tri_mask = np.zeros((NM, MAXT), bool)
    tri_fr = np.ones((NM, MAXT), f32)
    tri_re = np.ones((NM, MAXT), f32)
    aabb = np.zeros((NM, 2, 3), f32)
    grid = np.full((NM, GX, GY, cap), -1, np.int32)
    gorigin = np.zeros((NM, 2), f32)
    gcell = np.ones((NM,), f32)
    gaxes = np.zeros((NM, 2), np.int32)
    for i, (tv, n, adj, fr, re, g, origin, cell, axes, bounds) in enumerate(pre):
        T = len(tv)
        tri_verts[i, :T] = tv
        tri_normal[i, :T] = n
        adj_normal[i, :T] = adj
        tri_mask[i, :T] = True
        tri_fr[i, :T] = fr
        tri_re[i, :T] = re
        aabb[i, 0], aabb[i, 1] = bounds
        grid[i, :g.shape[0], :g.shape[1]] = g
        gorigin[i] = origin
        gcell[i] = cell
        gaxes[i] = axes
    return MeshTable(
        tri_verts=jnp.asarray(tri_verts), tri_normal=jnp.asarray(tri_normal),
        adj_normal=jnp.asarray(adj_normal), tri_mask=jnp.asarray(tri_mask),
        tri_friction=jnp.asarray(tri_fr), tri_restitution=jnp.asarray(tri_re),
        aabb=jnp.asarray(aabb),
        grid=jnp.asarray(grid), grid_origin=jnp.asarray(gorigin),
        grid_cell=jnp.asarray(gcell), grid_axes=jnp.asarray(gaxes))


def candidate_tris(mesh: MeshTable, mesh_idx, point_local):
    """Triangle-id candidates near an object-space point: one grid gather.
    mesh_idx [K], point_local [K,3] -> ids [K,CAP] (-1 pad)."""
    mi = jnp.clip(mesh_idx, 0, max(mesh.grid.shape[0] - 1, 0))
    axes = mesh.grid_axes[mi]                      # [K,2]
    u = jnp.take_along_axis(point_local, axes[:, 0:1], axis=1)[:, 0]
    v = jnp.take_along_axis(point_local, axes[:, 1:2], axis=1)[:, 0]
    org = mesh.grid_origin[mi]
    cell = mesh.grid_cell[mi]
    cx = jnp.clip(((u - org[:, 0]) / cell).astype(jnp.int32), 0,
                  mesh.grid.shape[1] - 1)
    cy = jnp.clip(((v - org[:, 1]) / cell).astype(jnp.int32), 0,
                  mesh.grid.shape[2] - 1)
    return mesh.grid[mi, cx, cy]                   # [K,CAP]
