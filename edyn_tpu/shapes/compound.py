"""Compound shapes: rigid unions of convex children.

Reference: compound_shape (include/edyn/shapes/compound_shape.hpp:1-127) — a
list of convex children with local transforms plus a static tree over them;
collide_compound_* recurses into children.

TPU design: children live as EXTRA rows of the unified convex table (past the
N body rows), so the compound narrowphase expands each (compound, other) pair
into (child, other) sub-pairs that run through the SAME unified support-SAT
kernel and fold back to <=4 points — exactly the mesh-kernel pattern with
children instead of triangles. Mass properties (mass-weighted inertia with
parallel-axis shift) are composed host-side at build.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .params import CompoundShape, ShapeType
from .inertia import moment_of_inertia, polyhedron_inertia


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class CompoundTable:
    """Padded per-compound child lists. child_row indexes the convex table;
    child_type/child_params carry the raw shape descriptors for per-child
    raycast (reference: compound_shape's shapes_variant children,
    include/edyn/shapes/compound_shape.hpp:24-36)."""
    child_row: jnp.ndarray   # [NC, CH] int32 (-1 pad)
    child_pos: jnp.ndarray   # [NC, CH, 3] local
    child_orn: jnp.ndarray   # [NC, CH, 4] local (xyzw)
    child_mask: jnp.ndarray  # [NC, CH]
    child_type: jnp.ndarray    # [NC, CH] int32 ShapeType
    child_params: jnp.ndarray  # [NC, CH, 4]

    @staticmethod
    def empty() -> "CompoundTable":
        return CompoundTable(
            child_row=jnp.full((0, 1), -1, jnp.int32),
            child_pos=jnp.zeros((0, 1, 3)),
            child_orn=jnp.zeros((0, 1, 4)).at[..., 3].set(1.0),
            child_mask=jnp.zeros((0, 1), bool),
            child_type=jnp.zeros((0, 1), jnp.int32),
            child_params=jnp.zeros((0, 1, 4)))


def compound_mass_properties(comp: CompoundShape, mass: float):
    """(inertia 3x3 about origin-as-COM, com offset). Children are weighted by
    volume fraction (reference computes per-child moments and sums with the
    parallel-axis theorem)."""
    from .params import PolyhedronShape
    vols = []
    for shape, lpos, lorn in comp.children:
        st, prm = (None, None)
        if isinstance(shape, PolyhedronShape):
            from .params import _convex_hull
            v = np.asarray(shape.vertices, np.float64)
            faces = _convex_hull(v)
            vol = abs(sum(np.linalg.det(np.stack([v[f[0]], v[f[1]], v[f[2]]],
                                                 axis=1)) / 6 for f in faces))
        else:
            st, prm = shape.pack()
            p = np.asarray(prm)
            if st == ShapeType.SPHERE:
                vol = 4 / 3 * np.pi * p[0] ** 3
            elif st == ShapeType.BOX:
                vol = 8 * p[0] * p[1] * p[2]
            elif st == ShapeType.CAPSULE:
                vol = np.pi * p[0] ** 2 * (2 * p[1]) + 4 / 3 * np.pi * p[0] ** 3
            elif st == ShapeType.CYLINDER:
                vol = np.pi * p[0] ** 2 * 2 * p[1]
            else:
                vol = 1.0
        vols.append(max(vol, 1e-9))
    vols = np.asarray(vols)
    fracs = vols / vols.sum()

    def quat_to_mat(q):
        from ..math import quat as qm
        return np.asarray(qm.to_matrix(jnp.asarray(q, jnp.float32)))

    com = np.zeros(3)
    for frac, (shape, lpos, lorn) in zip(fracs, comp.children):
        com += frac * np.asarray(lpos, np.float64)

    I_total = np.zeros((3, 3))
    for frac, (shape, lpos, lorn) in zip(fracs, comp.children):
        m_child = mass * frac
        from .params import PolyhedronShape
        if isinstance(shape, PolyhedronShape):
            I_local = polyhedron_inertia(shape.vertices, m_child)
        else:
            st, prm = shape.pack()
            I_local = np.diag(moment_of_inertia(int(st), prm, m_child))
        R = quat_to_mat(np.asarray(lorn, np.float64))
        I_rot = R @ I_local @ R.T
        d = np.asarray(lpos, np.float64) - com
        I_total += I_rot + m_child * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
    return I_total, com


def compound_aabb_extent(comp: CompoundShape) -> float:
    """Conservative bounding radius of the compound about its origin."""
    r = 0.0
    for shape, lpos, lorn in comp.children:
        st, prm = shape.pack() if not hasattr(shape, "vertices") else (None, None)
        if st is None:
            ext = float(np.abs(np.asarray(shape.vertices)).max())
        else:
            p = np.asarray(prm)
            if st == ShapeType.SPHERE:
                ext = p[0]
            elif st == ShapeType.BOX:
                ext = float(np.linalg.norm(p[:3]))
            else:
                ext = float(p[0] + p[1])
        r = max(r, float(np.linalg.norm(lpos)) + ext)
    return r
