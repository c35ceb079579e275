"""Contact-manifold persistence and point merging.

Replaces the reference's manifold entity lifecycle + point persistence logic
(include/edyn/util/collision_util.hpp:30-105,
src/edyn/util/collision_util.cpp:158-438; SURVEY A.4) with sort/searchsorted
matching over pair keys and batched nearest-pivot warm-start inheritance:

1. Broadphase emits this step's pair keys, sorted. The previous step's
   manifold table is also key-sorted, so ``searchsorted`` aligns old manifolds
   with new pairs in O(P log P) with no hash map.
2. Narrowphase produces fresh <=4-point results per pair. Each fresh point
   inherits accumulated impulses and lifetime from the nearest old point whose
   pivot distance^2 is under contact_caching_threshold^2 — that is exactly the
   reference's merge criterion (collision_util.cpp:205-280), reformulated as a
   [M,4_new,4_old] batched argmin instead of per-point scalar search.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import CONTACT_CACHING_THRESHOLD
from ..core.state import ContactTable
from .broadphase import INVALID_KEY


def carry_over(old: ContactTable, keys, body_a, body_b, pair_valid) -> ContactTable:
    """Build this step's manifold table in broadphase-pair order, gathering
    persistent state (points, impulses, lifetimes) from the previous table for
    pairs that already existed.

    Dispatch design: the key match uses the unrolled k-ary search (one gather
    per round instead of jnp.searchsorted's ~log2(M)-dispatch while-loop),
    and all persistent per-point columns are packed into one [M,4,17] array
    so the carry costs ONE large gather. Every default is zero, so the
    unmatched case is a multiply by the match mask."""
    from ..ops.search import kary_searchsorted
    idx = kary_searchsorted(old.key, keys, side="left")
    idx = jnp.clip(idx, 0, old.key.shape[0] - 1)
    matched = (old.key[idx] == keys) & pair_valid & old.valid[idx]

    f = lambda x: x.astype(jnp.float32)[..., None]
    pk = jnp.concatenate([
        old.pivot_a, old.pivot_b, old.local_normal,       # 0:3, 3:6, 6:9
        f(old.normal_attachment), f(old.distance),        # 9, 10
        f(old.lifetime), f(old.normal_impulse),           # 11, 12
        old.friction_impulse, f(old.spin_impulse),        # 13:15, 15
        old.roll_impulse, f(old.point_valid),             # 16:18, 18
    ], axis=-1)
    g = jnp.where(matched[:, None, None], pk[idx], 0.0)

    return ContactTable(
        key=keys,
        body_a=body_a.astype(jnp.int32),
        body_b=body_b.astype(jnp.int32),
        valid=pair_valid,
        point_valid=g[..., 18] > 0.5,
        pivot_a=g[..., 0:3],
        pivot_b=g[..., 3:6],
        local_normal=g[..., 6:9],
        normal_attachment=g[..., 9].astype(jnp.int32),
        distance=g[..., 10],
        lifetime=g[..., 11].astype(jnp.int32),
        normal_impulse=g[..., 12],
        friction_impulse=g[..., 13:15],
        spin_impulse=g[..., 15],
        roll_impulse=g[..., 16:18],
    )


def merge_points(man: ContactTable, new_pivot_a, new_pivot_b, new_local_normal,
                 new_attachment, new_distance, new_point_valid) -> ContactTable:
    """Merge freshly detected points into the carried-over manifold.

    The fresh points become the manifold (narrowphase already caps at 4 points
    maximizing spread); each inherits warm-start impulses from the nearest
    previous point within contact_caching_threshold of either pivot
    (reference: collision_util.cpp:205-280 merge criterion)."""
    thr2 = CONTACT_CACHING_THRESHOLD * CONTACT_CACHING_THRESHOLD

    # [M, new, old] pivot distance^2 (use pivot on A; reference tries both
    # pivots — take the min of the two)
    da = jnp.sum((new_pivot_a[:, :, None, :] - man.pivot_a[:, None, :, :]) ** 2, -1)
    db = jnp.sum((new_pivot_b[:, :, None, :] - man.pivot_b[:, None, :, :]) ** 2, -1)
    d2 = jnp.minimum(da, db)
    d2 = jnp.where(man.point_valid[:, None, :], d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)                       # [M,4]
    best_d2 = jnp.take_along_axis(d2, best[..., None], axis=-1)[..., 0]
    inherit = new_point_valid & (best_d2 < thr2)

    # persistent per-point payload packed [M,4,7] -> ONE take_along_axis
    f = lambda x: x.astype(jnp.float32)[..., None]
    pk = jnp.concatenate([
        f(man.lifetime), f(man.normal_impulse), man.friction_impulse,
        f(man.spin_impulse), man.roll_impulse], axis=-1)
    g = jnp.take_along_axis(pk, best[..., None], axis=1)
    g = jnp.where(inherit[..., None], g, 0.0)
    lifetime = jnp.where(inherit, g[..., 0].astype(jnp.int32) + 1, 0)
    n_imp = g[..., 1]
    f_imp = g[..., 2:4]
    s_imp = g[..., 4]
    r_imp = g[..., 5:7]

    return dataclasses.replace(
        man,
        point_valid=new_point_valid & man.valid[:, None],
        pivot_a=new_pivot_a,
        pivot_b=new_pivot_b,
        local_normal=new_local_normal,
        normal_attachment=new_attachment,
        distance=new_distance,
        lifetime=lifetime,
        normal_impulse=n_imp,
        friction_impulse=f_imp,
        spin_impulse=s_imp,
        roll_impulse=r_imp,
    )
