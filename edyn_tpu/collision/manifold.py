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

from ..config import (
    CONTACT_BREAKING_THRESHOLD, CONTACT_CACHING_THRESHOLD,
    CONTACT_MERGING_THRESHOLD,
)
from ..core.state import ContactTable
from .broadphase import INVALID_KEY


def carry_over(old: ContactTable, keys, body_a, body_b, pair_valid):
    """Build this step's manifold table in broadphase-pair order, gathering
    persistent state (points, impulses, lifetimes) from the previous table for
    pairs that already existed. Returns ``(table, dropped)`` where ``dropped``
    marks OLD manifolds claimed by no new pair (AABBs separated) — the
    stepper wakes their islands, the analogue of the reference waking an
    island when a graph edge is destroyed (island_manager.cpp:74-98
    on_destroy_island_resident -> m_islands_to_wake_up).

    Dispatch design: the key match uses the unrolled k-ary search (one gather
    per round instead of jnp.searchsorted's ~log2(M)-dispatch while-loop),
    and all persistent per-point columns are packed into one [M,4,17] array
    so the carry costs ONE large gather. Every default is zero, so the
    unmatched case is a multiply by the match mask."""
    from ..ops.search import kary_searchsorted
    idx = kary_searchsorted(old.key, keys, side="left", k=16)
    idx = jnp.clip(idx, 0, old.key.shape[0] - 1)
    matched = (old.key[idx] == keys) & pair_valid & old.valid[idx]
    claimed = jnp.zeros_like(old.valid).at[
        jnp.where(matched, idx, 0)].max(matched)
    dropped = old.valid & ~claimed

    f = lambda x: x.astype(jnp.float32)[..., None]
    pk = jnp.concatenate([
        old.pivot_a, old.pivot_b, old.local_normal,       # 0:3, 3:6, 6:9
        f(old.normal_attachment), f(old.distance),        # 9, 10
        f(old.lifetime), f(old.normal_impulse),           # 11, 12
        old.friction_impulse, f(old.spin_impulse),        # 13:15, 15
        old.roll_impulse, f(old.point_valid),             # 16:18, 18
        f(old.friction_scale), f(old.restitution_scale),  # 19, 20
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
        friction_scale=g[..., 19],
        restitution_scale=g[..., 20],
    ), dropped


def _manifold_score(p0, p1, p2, p3):
    """Value proportional to the contact patch area spanned by 4 points
    (reference: manifold_score, src/edyn/math/geom.cpp:847-855)."""
    from ..math import vec
    c0 = vec.cross(p0 - p1, p0 - p2)
    c1 = vec.cross(p0 - p2, p0 - p3)
    c2 = vec.cross(p0 - p3, p0 - p1)
    c3 = vec.cross(p1 - p2, p2 - p3)
    return (vec.length_sqr(c0) + vec.length_sqr(c1)
            + vec.length_sqr(c2) + vec.length_sqr(c3))


def merge_points(man: ContactTable, new_pivot_a, new_pivot_b, new_local_normal,
                 new_attachment, new_distance, new_point_valid,
                 pose=None, dt: float = 1.0 / 60.0,
                 scales=None) -> ContactTable:
    """Merge freshly detected points into the carried-over manifold with the
    reference's RETENTION semantics (process_collision,
    include/edyn/util/collision_util.hpp:105-276, batched):

    1. Every existing point looks for the nearest fresh point within
       contact_caching_threshold of either pivot (find_nearest_contact,
       src/edyn/util/collision_util.cpp:233-255); rolling bodies additionally
       match against back-rotated world pivots (find_nearest_contact_rolling,
       :257-280). Matched points ADOPT the fresh geometry and keep their
       accumulated impulses; each fresh point merges at most one existing
       point (ties resolved by distance — the reference resolves by list
       order, an arbitrary choice).
    2. UNMATCHED existing points are KEPT — warm-start continuity does not
       depend on the detector re-emitting every point — until their
       recomputed normal separation exceeds contact_breaking_threshold or
       the tangential pivot drift^2 exceeds its square (should_remove_point,
       collision_util.cpp:399-413). Kept points get their distance refreshed
       from current transforms (the reference's update_contact_distances).
    3. Leftover fresh points insert into the retained set: merge into a slot
       within contact_merging_threshold (keeping its impulses), else append
       to a free slot, else replace the slot that maximizes the manifold
       area score, else drop (insertion_point_index,
       src/edyn/math/geom.cpp:857-1010).

    ``pose`` carries (pos_a, orn_a, angvel_a, rolling_a, pos_b, orn_b,
    angvel_b, rolling_b) gathered per pair — needed for drift measurement and
    rolling matching; without it, steps 1/3 run but unmatched points break
    immediately (legacy behavior for direct callers)."""
    from ..math import quat as _q
    cache2 = CONTACT_CACHING_THRESHOLD * CONTACT_CACHING_THRESHOLD
    merge2 = CONTACT_MERGING_THRESHOLD * CONTACT_MERGING_THRESHOLD
    break_thr = CONTACT_BREAKING_THRESHOLD

    ov = man.point_valid                         # [M,O]
    nv = new_point_valid & man.valid[:, None]    # [M,N]
    M, O = ov.shape
    Nn = nv.shape[1]

    # --- step 1: nearest-match existing -> fresh ---
    da = jnp.sum((man.pivot_a[:, :, None, :] - new_pivot_a[:, None, :, :]) ** 2, -1)
    db = jnp.sum((man.pivot_b[:, :, None, :] - new_pivot_b[:, None, :, :]) ** 2, -1)
    d2 = jnp.minimum(da, db)                     # [M,O,N]
    pairable = ov[:, :, None] & nv[:, None, :]
    d2_direct = jnp.where(pairable & (d2 < cache2), d2, jnp.inf)

    if pose is not None:
        pos_a, orn_a, angvel_a, rolling_a, pos_b, orn_b, angvel_b, rolling_b = pose
        # back-rotated world pivots (reference find_nearest_contact_rolling)
        d2_roll = jnp.full_like(d2, jnp.inf)
        for pos, orn, w, rolling, old_piv, new_piv in (
                (pos_a, orn_a, angvel_a, rolling_a, man.pivot_a, new_pivot_a),
                (pos_b, orn_b, angvel_b, rolling_b, man.pivot_b, new_pivot_b)):
            prev_orn = _q.integrate(orn, w, -dt)
            prev_w = pos[:, None, :] + _q.rotate(prev_orn[:, None, :], old_piv)
            new_w = pos[:, None, :] + _q.rotate(orn[:, None, :], new_piv)
            dr = jnp.sum((prev_w[:, :, None, :] - new_w[:, None, :, :]) ** 2, -1)
            dr = jnp.where(pairable & (dr < cache2) & rolling[:, None, None],
                           dr, jnp.inf)
            d2_roll = jnp.minimum(d2_roll, dr)
        has_direct = jnp.any(jnp.isfinite(d2_direct), axis=-1, keepdims=True)
        d2_eff = jnp.where(has_direct, d2_direct, d2_roll)
    else:
        d2_eff = d2_direct

    nearest_n = jnp.argmin(d2_eff, axis=-1)                      # [M,O]
    nearest_d2 = jnp.take_along_axis(d2_eff, nearest_n[..., None], -1)[..., 0]
    claims = jnp.isfinite(nearest_d2)                            # [M,O]

    # dedupe: each fresh point keeps its closest claimant
    match_mat = claims[:, :, None] & (
        nearest_n[:, :, None] == jnp.arange(Nn)[None, None, :])  # [M,O,N]
    cost = jnp.where(match_mat, d2_eff, jnp.inf)
    winner_o = jnp.argmin(cost, axis=1)                          # [M,N]
    won = jnp.isfinite(jnp.min(cost, axis=1))                    # [M,N] merged fresh
    matched = claims & (jnp.take_along_axis(winner_o, nearest_n, axis=1)
                        == jnp.arange(O)[None, :])               # [M,O]

    # --- adopt fresh geometry for matched slots (packed) ---
    f = lambda x: x.astype(jnp.float32)[..., None]
    if scales is None:
        scales = jnp.ones(new_distance.shape + (2,))
    new_geom = jnp.concatenate([
        new_pivot_a, new_pivot_b, new_local_normal,
        f(new_attachment), f(new_distance), scales], axis=-1)    # [M,N,13]
    old_geom = jnp.concatenate([
        man.pivot_a, man.pivot_b, man.local_normal,
        f(man.normal_attachment), f(man.distance),
        man.friction_scale[..., None],
        man.restitution_scale[..., None]], axis=-1)              # [M,O,13]
    adopted = jnp.take_along_axis(new_geom, nearest_n[..., None], axis=1)
    geom = jnp.where(matched[..., None], adopted, old_geom)

    # --- step 2: keep-or-break unmatched existing points ---
    if pose is not None:
        piv_a = geom[..., 0:3]
        piv_b = geom[..., 3:6]
        ln = geom[..., 6:9]
        att = geom[..., 9].astype(jnp.int32)
        pA_w = pos_a[:, None, :] + _q.rotate(orn_a[:, None, :], piv_a)
        pB_w = pos_b[:, None, :] + _q.rotate(orn_b[:, None, :], piv_b)
        n_w = jnp.where((att == 1)[..., None], _q.rotate(orn_a[:, None, :], ln),
                        jnp.where((att == 2)[..., None],
                                  _q.rotate(orn_b[:, None, :], ln), ln))
        d = pA_w - pB_w
        nd = jnp.sum(d * n_w, -1)
        tang2 = jnp.sum((d - nd[..., None] * n_w) ** 2, -1)
        breaking = (nd > break_thr) | (tang2 > break_thr * break_thr)
        keep = ov & (matched | ~breaking)
        # refresh stored distance from current transforms for kept points
        geom = geom.at[..., 10].set(jnp.where(matched, geom[..., 10], nd))
    else:
        keep = ov & matched

    lifetime = jnp.where(keep, man.lifetime + 1, 0)
    imp = jnp.concatenate([
        f(man.normal_impulse)[..., 0:1], man.friction_impulse,
        f(man.spin_impulse)[..., 0:1], man.roll_impulse], axis=-1)  # [M,O,6]
    imp = jnp.where(keep[..., None], imp, 0.0)
    valid = keep

    # --- step 3: insert leftover fresh points (unrolled over N) ---
    for j in range(Nn):
        want = nv[:, j] & ~won[:, j]                             # [M]
        pj_geom = new_geom[:, j]                                 # [M,11]
        pj_a = pj_geom[:, 0:3]
        # similar: within merging threshold of a retained slot -> adopt
        # geometry there, keep that slot's impulses
        ds = jnp.sum((geom[..., 0:3] - pj_a[:, None, :]) ** 2, -1)
        ds = jnp.where(valid, ds, jnp.inf)
        sim_slot = jnp.argmin(ds, axis=-1)
        sim_ok = want & (jnp.min(ds, axis=-1) < merge2)
        # append: first free slot
        free_slot = jnp.argmin(valid, axis=-1)
        has_free = ~jnp.all(valid, axis=-1)
        app_ok = want & ~sim_ok & has_free
        # replace: best area score among the 4 replace options, if better
        # than the current set's score (only relevant when full)
        pts = geom[..., 0:3]                                     # [M,O,3]
        cur = _manifold_score(pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3])
        scores = []
        for r in range(O):
            ps = [pj_a if k == r else pts[:, k] for k in range(O)]
            scores.append(_manifold_score(*ps))
        scores = jnp.stack(scores, axis=-1)                      # [M,O]
        rep_slot = jnp.argmax(scores, axis=-1)
        rep_ok = want & ~sim_ok & ~has_free & \
            (jnp.max(scores, axis=-1) > cur)

        slot = jnp.where(sim_ok, sim_slot,
                         jnp.where(app_ok, free_slot, rep_slot))
        doit = sim_ok | app_ok | rep_ok
        onehot = doit[:, None] & (jnp.arange(O)[None, :] == slot[:, None])
        geom = jnp.where(onehot[..., None], pj_geom[:, None, :], geom)
        # similar keeps the slot's impulses/lifetime; append/replace reset
        reset = onehot & ~sim_ok[:, None]
        imp = jnp.where(reset[..., None], 0.0, imp)
        lifetime = jnp.where(reset, 0, lifetime)
        valid = valid | onehot

    return dataclasses.replace(
        man,
        point_valid=valid & man.valid[:, None],
        pivot_a=geom[..., 0:3],
        pivot_b=geom[..., 3:6],
        local_normal=geom[..., 6:9],
        normal_attachment=geom[..., 9].astype(jnp.int32),
        distance=geom[..., 10],
        lifetime=lifetime,
        normal_impulse=imp[..., 0],
        friction_impulse=imp[..., 1:3],
        spin_impulse=imp[..., 3],
        roll_impulse=imp[..., 4:6],
        friction_scale=geom[..., 11],
        restitution_scale=geom[..., 12],
    )
