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

import jax
import jax.numpy as jnp

from ..config import (
    CONTACT_BREAKING_THRESHOLD, CONTACT_CACHING_THRESHOLD,
    CONTACT_MERGING_THRESHOLD,
)
from ..core.state import ContactTable
from .broadphase import INVALID_KEY


def update_slots(old: ContactTable, keys, body_a, body_b, pair_valid):
    """Reconcile the SLOT-STABLE manifold table with this step's admitted
    pair list. Surviving pairs keep their slot — their points/impulses/
    lifetimes never move — new pairs allocate freed slots, and vanished
    pairs are invalidated. Returns ``(table, dropped, n_dropped, same)``:
    ``dropped`` marks slots whose manifold was claimed by no new pair
    (AABBs separated) — the stepper wakes their islands, the analogue of
    the reference waking an island when a graph edge is destroyed
    (island_manager.cpp:74-98); ``same`` is True when the admitted pair
    list is identical to last step's (the no-op fast path was taken —
    downstream steady-state skips key off it).

    Replaces the r1-r3 design that rebuilt the table in sorted-key order
    every step: that paid a [M,4,21] carry gather (~6 ns per gathered index
    on the measured cost law) even when nothing changed. Here the steady
    state (identical key list — every settled or sleeping step) short-
    circuits to a no-op under lax.cond, and a changing step costs a k-ary
    key match plus O(P) int scatters — no point-data movement at all.

    Reference analogue: contact_manifold_map lookup + manifold entity
    create/destroy (collision/contact_manifold_map.hpp, broadphase.cpp
    destroy_separated_manifolds)."""
    from ..ops.search import kary_searchsorted
    M = old.key.shape[0]
    P = keys.shape[0]
    body_a = body_a.astype(jnp.int32)
    body_b = body_b.astype(jnp.int32)

    same = jnp.all(keys == old.sort_key[:P]) \
        & jnp.all(pair_valid == old.sort_pvalid[:P])
    if P < M:
        # a backfilled v3/v4 checkpoint can hold more live sorted entries
        # than max_pairs; the P-truncated comparison must not fast-path
        # past live tail keys (they would survive un-dropped forever)
        same &= jnp.all(old.sort_key[P:] == INVALID_KEY)

    def fast(_):
        return old, jnp.zeros((M,), bool), jnp.zeros((), jnp.int32)


    def full(_):
        idx = kary_searchsorted(old.sort_key, keys, side="left", k=16)
        idxc = jnp.clip(idx, 0, M - 1)
        slot_m = old.sort_slot[idxc]
        found = (old.sort_key[idxc] == keys) & pair_valid & (slot_m < M)
        slot_mc = jnp.where(found, slot_m, 0)
        matched = found & old.valid[slot_mc]
        slot_mc = jnp.where(matched, slot_mc, 0)

        keep = jnp.zeros((M,), bool).at[
            jnp.where(matched, slot_mc, 0)].max(matched)
        dropped_slots = old.valid & ~keep

        # allocate freed slots to new pairs (both ascending -> deterministic)
        is_new = pair_valid & ~matched
        new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        from .broadphase import _compact
        free_slot, free_cnt = _compact(~keep, M)
        slot_n = free_slot[jnp.clip(new_rank, 0, M - 1)]
        alloc = is_new & (new_rank < free_cnt) & (slot_n >= 0)
        n_dropped = (jnp.sum(is_new) - jnp.sum(alloc)).astype(jnp.int32)

        written = matched | alloc
        slot_w = jnp.where(matched, slot_mc,
                           jnp.where(alloc, jnp.clip(slot_n, 0, M - 1), M))
        slot_w = jnp.where(written, slot_w, M)

        tab = dataclasses.replace(
            old,
            key=old.key.at[slot_w].set(keys, mode="drop"),
            body_a=old.body_a.at[slot_w].set(body_a, mode="drop"),
            body_b=old.body_b.at[slot_w].set(body_b, mode="drop"),
            valid=keep.at[slot_w].set(written, mode="drop"),
            # dead and freshly reallocated slots lose their points; all
            # other persistent columns are gated by point_valid downstream
            point_valid=old.point_valid & keep[:, None],
            sort_key=_padM(keys, M, INVALID_KEY),
            sort_slot=_padM(slot_w, M, M),
            sort_pvalid=_padM(pair_valid, M, False),
        )
        return tab, dropped_slots, n_dropped

    tab, dropped_slots, n_dropped = jax.lax.cond(same, fast, full, None)
    return tab, dropped_slots, n_dropped, same


def _padM(x, M, fill):
    P = x.shape[0]
    if P == M:
        return x
    return jnp.concatenate([x, jnp.full((M - P,), fill, x.dtype)])


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
    nearest_d2 = jnp.min(d2_eff, axis=-1)
    claims = jnp.isfinite(nearest_d2)                            # [M,O]

    # one-hot of each existing point's nearest fresh point — selections
    # along the tiny 4-point axis are arithmetic sums, never gathers
    # (a [M,4]-wide take_along_axis costs ~6 ns/index on this runtime)
    near_oh = (nearest_n[:, :, None] == jnp.arange(Nn)[None, None, :])

    # dedupe: each fresh point keeps its closest claimant
    match_mat = claims[:, :, None] & near_oh                     # [M,O,N]
    cost = jnp.where(match_mat, d2_eff, jnp.inf)
    winner_o = jnp.argmin(cost, axis=1)                          # [M,N]
    won = jnp.isfinite(jnp.min(cost, axis=1))                    # [M,N] merged fresh
    winner_at_nearest = jnp.sum(jnp.where(near_oh, winner_o[:, None, :], 0),
                                axis=-1)                         # [M,O]
    matched = claims & (winner_at_nearest == jnp.arange(O)[None, :])

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
    adopted = jnp.sum(jnp.where(near_oh[..., None], new_geom[:, None, :, :],
                                0.0), axis=2)                    # [M,O,13]
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
