"""Narrowphase: type-bucketed contact generation over the pair list.

Replaces the reference's double-dispatch ``visit_shape x visit_shape ->
collide(shA, shB)`` (src/edyn/util/collision_util.cpp:440-475,
src/edyn/collision/narrowphase.cpp:21-109). Pairs are partitioned by
(typeA, typeB) bucket with a static presence check (which shape types exist in
a world is known at build time, so absent buckets cost nothing at trace time);
each bucket kernel runs vectorized over its gathered pairs and scatters its
<=4-point results back into the manifold table, where they are merged with the
persistent points for warm-start continuity (manifold.merge_points).

Kernel contract: fn(A: Side, B: Side, threshold) -> ContactResult with A as
the canonical lower-enum type. Bespoke kernels cover the hot pairs; the
generic support-SAT kernel (support_sat.py) covers the rest of the convex
matrix — together they replace the reference's 28 collide() translation units.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..math import quat
from ..shapes.params import NUM_SHAPE_TYPES, ShapeType
from .kernels import box_box, poly_plane, primitives
from .kernels.common import ContactResult
from .kernels.support import Side
from .kernels.support_sat import make_support_kernel
from .manifold import merge_points

S = ShapeType


def _adapt(fn: Callable) -> Callable:
    """Wrap a positional primitive kernel into the Side-based contract."""
    def wrapped(A: Side, B: Side, threshold):
        return fn(A.pos, A.orn, A.params, B.pos, B.orn, B.params, threshold)
    wrapped.__name__ = fn.__name__
    return wrapped


KERNELS: dict[tuple[int, int], Callable] = {
    (S.SPHERE, S.SPHERE): _adapt(primitives.collide_sphere_sphere),
    (S.SPHERE, S.BOX): _adapt(primitives.collide_sphere_box),
    (S.SPHERE, S.CAPSULE): _adapt(primitives.collide_sphere_capsule),
    (S.SPHERE, S.CYLINDER): make_support_kernel(S.SPHERE, S.CYLINDER),
    (S.SPHERE, S.PLANE): _adapt(primitives.collide_sphere_plane),
    (S.SPHERE, S.POLYHEDRON): make_support_kernel(S.SPHERE, S.POLYHEDRON),
    (S.BOX, S.BOX): _adapt(box_box.collide_box_box),
    (S.BOX, S.CAPSULE): make_support_kernel(S.BOX, S.CAPSULE),
    (S.BOX, S.CYLINDER): make_support_kernel(S.BOX, S.CYLINDER),
    (S.BOX, S.PLANE): _adapt(primitives.collide_box_plane),
    (S.BOX, S.POLYHEDRON): make_support_kernel(S.BOX, S.POLYHEDRON),
    (S.CAPSULE, S.CAPSULE): _adapt(primitives.collide_capsule_capsule),
    (S.CAPSULE, S.CYLINDER): make_support_kernel(S.CAPSULE, S.CYLINDER),
    (S.CAPSULE, S.PLANE): _adapt(primitives.collide_capsule_plane),
    (S.CAPSULE, S.POLYHEDRON): make_support_kernel(S.CAPSULE, S.POLYHEDRON),
    (S.CYLINDER, S.CYLINDER): make_support_kernel(S.CYLINDER, S.CYLINDER),
    (S.CYLINDER, S.PLANE): _adapt(primitives.collide_cylinder_plane),
    (S.CYLINDER, S.POLYHEDRON): make_support_kernel(S.CYLINDER, S.POLYHEDRON),
    (S.PLANE, S.POLYHEDRON): None,  # handled swapped: polyhedron is A
    (S.POLYHEDRON, S.POLYHEDRON): make_support_kernel(S.POLYHEDRON, S.POLYHEDRON),
}
# plane buckets run with the plane as body B regardless of enum order
KERNELS[(S.PLANE, S.POLYHEDRON)] = lambda A, B, t: poly_plane.collide_polyhedron_plane(B, A, t).swapped()

# convex-vs-trimesh buckets (B = mesh body; paged meshes use the same path)
from .kernels.mesh import make_mesh_kernel  # noqa: E402
for _t in (S.SPHERE, S.BOX, S.CAPSULE, S.CYLINDER, S.POLYHEDRON):
    for _m in (S.MESH, S.PAGED_MESH):
        KERNELS[(_t, _m)] = make_mesh_kernel(int(_t))


def bucket_id(ta, tb):
    """Canonical bucket id with swap flag."""
    lo = jnp.minimum(ta, tb)
    hi = jnp.maximum(ta, tb)
    return lo * NUM_SHAPE_TYPES + hi, ta > tb


def _gather_side(state, idx) -> Side:
    """Gather one body of each pair into a Side struct."""
    poly = state.poly
    has_poly = poly.verts.shape[0] > 0
    si = jnp.clip(state.shape_index[idx], 0,
                  max(poly.verts.shape[0] - 1, 0))
    if has_poly:
        verts = poly.verts[si]
        vmask = poly.vert_mask[si] & (
            state.shape_type[idx] == S.POLYHEDRON)[:, None]
        fnorm = poly.face_normals[si]
        fmask = poly.face_mask[si] & (
            state.shape_type[idx] == S.POLYHEDRON)[:, None]
        edirs = poly.edge_dirs[si]
        emask = poly.edge_mask[si] & (
            state.shape_type[idx] == S.POLYHEDRON)[:, None]
    else:
        K = idx.shape[0]
        verts = jnp.zeros((K, 1, 3))
        vmask = jnp.zeros((K, 1), bool)
        fnorm = jnp.zeros((K, 1, 3))
        fmask = jnp.zeros((K, 1), bool)
        edirs = jnp.zeros((K, 1, 3))
        emask = jnp.zeros((K, 1), bool)
    return Side(pos=state.pos[idx], orn=state.orn[idx],
                params=state.shape_params[idx],
                verts=verts, vert_mask=vmask,
                face_normals=fnorm, face_mask=fmask,
                edge_dirs=edirs, edge_mask=emask)


def update_contacts(state, man, threshold: float, types_present: frozenset,
                    bucket_cap: int | None = None):
    """Run all applicable bucket kernels over the manifold pair list and merge
    fresh points into ``man`` (the carried-over manifold table)."""
    M = man.key.shape[0]
    cap = bucket_cap or M
    ta = state.shape_type[man.body_a]
    tb = state.shape_type[man.body_b]
    bid, swap = bucket_id(ta, tb)
    bid = jnp.where(man.valid, bid, -1)

    new_pivot_a = jnp.zeros((M, 4, 3))
    new_pivot_b = jnp.zeros((M, 4, 3))
    new_normal = jnp.zeros((M, 4, 3))
    new_attach = jnp.zeros((M, 4), jnp.int32)
    new_dist = jnp.zeros((M, 4))
    new_valid = jnp.zeros((M, 4), bool)

    for (lo, hi), kernel in KERNELS.items():
        if int(lo) not in types_present or int(hi) not in types_present:
            continue
        want = int(lo) * NUM_SHAPE_TYPES + int(hi)
        (sel,) = jnp.nonzero(bid == want, size=cap, fill_value=M)
        sel_ok = sel < M
        sel_c = jnp.minimum(sel, M - 1)
        a = man.body_a[sel_c]
        b = man.body_b[sel_c]
        sw = swap[sel_c]
        ka = jnp.where(sw, b, a)   # kernel body A = canonical lower type
        kb = jnp.where(sw, a, b)
        if getattr(kernel, "needs_mesh", False):
            res: ContactResult = kernel(
                _gather_side(state, ka), _gather_side(state, kb), threshold,
                mesh_table=state.mesh, mesh_index=state.shape_index[kb])
        else:
            res = kernel(_gather_side(state, ka), _gather_side(state, kb),
                         threshold)
        res_sw = res.swapped()
        pv = jnp.where(sw[:, None], res_sw.point_valid, res.point_valid) & sel_ok[:, None]
        pa = jnp.where(sw[:, None, None], res_sw.pivot_a, res.pivot_a)
        pb = jnp.where(sw[:, None, None], res_sw.pivot_b, res.pivot_b)
        nr = jnp.where(sw[:, None, None], res_sw.normal, res.normal)
        at = jnp.where(sw[:, None], res_sw.attachment, res.attachment)
        ds = res.distance

        new_valid = new_valid.at[sel].set(pv, mode="drop")
        new_pivot_a = new_pivot_a.at[sel].set(pa, mode="drop")
        new_pivot_b = new_pivot_b.at[sel].set(pb, mode="drop")
        new_normal = new_normal.at[sel].set(nr, mode="drop")
        new_attach = new_attach.at[sel].set(at, mode="drop")
        new_dist = new_dist.at[sel].set(ds, mode="drop")

    # store normal in attachment body's object space (reference:
    # contact_point_geometry local normal; re-rotated at row build and in the
    # position solver). attachment NONE keeps the world normal.
    orn_a = state.orn[man.body_a][:, None, :]
    orn_b = state.orn[man.body_b][:, None, :]
    local_n = jnp.where(
        (new_attach == 1)[..., None], quat.rotate_inv(orn_a, new_normal),
        jnp.where((new_attach == 2)[..., None], quat.rotate_inv(orn_b, new_normal),
                  new_normal))

    return merge_points(man, new_pivot_a, new_pivot_b, local_n, new_attach,
                        new_dist, new_valid)
