"""Narrowphase: type-bucketed contact generation over the pair list.

Replaces the reference's double-dispatch ``visit_shape x visit_shape ->
collide(shA, shB)`` (src/edyn/util/collision_util.cpp:440-475,
src/edyn/collision/narrowphase.cpp:21-109). Pairs are partitioned by
(typeA, typeB) bucket with a static presence check (which shape types exist in
a world is known at build time, so absent buckets cost nothing at trace time);
each bucket kernel runs vectorized over its gathered pairs and scatters its
<=4-point results back into the manifold table, where they are merged with the
persistent points for warm-start continuity (manifold.merge_points).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from ..shapes.params import ShapeType, NUM_SHAPE_TYPES
from .kernels import box_box, primitives
from .kernels.common import ContactResult
from .manifold import merge_points

# Registry: canonical (type_lo, type_hi) -> kernel. The kernel is always
# called with body A = type_lo, body B = type_hi; results are swapped back
# when the actual pair order was reversed (reference: swap_collide).
KERNELS: dict[tuple[int, int], Callable] = {
    (ShapeType.SPHERE, ShapeType.SPHERE): primitives.collide_sphere_sphere,
    (ShapeType.SPHERE, ShapeType.BOX): primitives.collide_sphere_box,
    (ShapeType.SPHERE, ShapeType.CAPSULE): primitives.collide_sphere_capsule,
    (ShapeType.SPHERE, ShapeType.PLANE): primitives.collide_sphere_plane,
    (ShapeType.BOX, ShapeType.BOX): box_box.collide_box_box,
    (ShapeType.BOX, ShapeType.PLANE): primitives.collide_box_plane,
    (ShapeType.CAPSULE, ShapeType.CAPSULE): primitives.collide_capsule_capsule,
    (ShapeType.CAPSULE, ShapeType.PLANE): primitives.collide_capsule_plane,
    (ShapeType.CYLINDER, ShapeType.PLANE): primitives.collide_cylinder_plane,
}


def bucket_id(ta, tb):
    """Canonical bucket id with swap flag."""
    lo = jnp.minimum(ta, tb)
    hi = jnp.maximum(ta, tb)
    return lo * NUM_SHAPE_TYPES + hi, ta > tb


def update_contacts(state, man, threshold: float, types_present: frozenset,
                    bucket_cap: int | None = None):
    """Run all applicable bucket kernels over the manifold pair list and merge
    fresh points into ``man`` (the carried-over manifold table).

    types_present: static set of ShapeType values present in the world —
    buckets whose types aren't present are skipped at trace time.
    """
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
        # kernel body A = type lo, body B = type hi
        ka = jnp.where(sw, b, a)
        kb = jnp.where(sw, a, b)
        res: ContactResult = kernel(
            state.pos[ka], state.orn[ka], state.shape_params[ka],
            state.pos[kb], state.orn[kb], state.shape_params[kb],
            threshold,
        )
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
    from ..math import quat
    orn_a = state.orn[man.body_a][:, None, :]
    orn_b = state.orn[man.body_b][:, None, :]
    local_n = jnp.where(
        (new_attach == 1)[..., None], quat.rotate_inv(orn_a, new_normal),
        jnp.where((new_attach == 2)[..., None], quat.rotate_inv(orn_b, new_normal),
                  new_normal))

    return merge_points(man, new_pivot_a, new_pivot_b, local_n, new_attach,
                        new_dist, new_valid)
