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
    pairs that already existed."""
    idx = jnp.searchsorted(old.key, keys)
    idx = jnp.clip(idx, 0, old.key.shape[0] - 1)
    matched = (old.key[idx] == keys) & pair_valid & old.valid[idx]

    def take(field, default):
        o = getattr(old, field)[idx]
        m = matched.reshape((-1,) + (1,) * (o.ndim - 1))
        return jnp.where(m, o, default)

    return ContactTable(
        key=keys,
        body_a=body_a.astype(jnp.int32),
        body_b=body_b.astype(jnp.int32),
        valid=pair_valid,
        point_valid=take("point_valid", False),
        pivot_a=take("pivot_a", 0.0),
        pivot_b=take("pivot_b", 0.0),
        local_normal=take("local_normal", 0.0),
        normal_attachment=take("normal_attachment", 0),
        distance=take("distance", 0.0),
        lifetime=take("lifetime", 0),
        normal_impulse=take("normal_impulse", 0.0),
        friction_impulse=take("friction_impulse", 0.0),
        spin_impulse=take("spin_impulse", 0.0),
        roll_impulse=take("roll_impulse", 0.0),
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

    def gather_old(x):
        return jnp.take_along_axis(x, best.reshape(best.shape + (1,) * (x.ndim - 2)), axis=1)

    lifetime = jnp.where(inherit, gather_old(man.lifetime) + 1, 0)
    n_imp = jnp.where(inherit, gather_old(man.normal_impulse), 0.0)
    f_imp = jnp.where(inherit[..., None], gather_old(man.friction_impulse), 0.0)
    s_imp = jnp.where(inherit, gather_old(man.spin_impulse), 0.0)
    r_imp = jnp.where(inherit[..., None], gather_old(man.roll_impulse), 0.0)

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
