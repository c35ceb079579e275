"""Simulation islands and sleeping as masked label propagation.

Replaces the reference's island_manager (src/edyn/simulation/island_manager.cpp;
SURVEY A.6): instead of entity-graph bookkeeping with merge/split events,
island labels are recomputed on device each step by iterative min-label
propagation with pointer jumping over the contact/joint edge list. Matching the
reference's rule, only dynamic ("procedural") bodies connect islands — a shared
static floor does not fuse islands because static/kinematic bodies never
propagate labels (reference: non-connecting nodes, island_manager.cpp:187-198).

Sleeping (reference: island_manager.cpp:541-596, config/constants.hpp:41-48):
an island sleeps when every member's velocities stay under the thresholds for
2 s. Here that's a per-island segmented reduction feeding per-body sleep
timers; waking is emergent — any fast body that gains an edge into a sleeping
island drags the island's max velocity over the threshold, resetting its
timers (the reference's explicit wake_up_island on merge).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import (
    ISLAND_ANGULAR_SLEEP_THRESHOLD, ISLAND_LINEAR_SLEEP_THRESHOLD,
    ISLAND_TIME_TO_SLEEP,
)
from ..math import vec


RESET_PERIOD = 8  # steps between label re-seeds (split correctness)


def compute_islands(state, man, num_iters: int = 16, warm_start: bool = True):
    """Returns ``(labels, converged)``: per-body island labels in [0, N)
    (non-dynamic bodies get their own index — they belong to many islands;
    reference: multi_island_resident) and a scalar bool that is True when the
    final iteration changed nothing, i.e. the labels are a fixpoint of the
    propagation (every live edge has equal endpoint labels). The steady-state
    skip (update_sleep) only trusts stored labels once they converged.

    ``warm_start`` seeds from the previous step's labels so a few iterations
    per step suffice (propagation continues across steps); every RESET_PERIOD
    steps the seed reverts to identity so SPLIT islands re-separate (min-label
    propagation can only merge). Transient fragmentation right after a reset
    is harmless: the sleep timer needs 2 s of consecutive quiet, so a 1-2 step
    fragmentation window never produces a wrong sleep."""
    N = state.capacity
    dyn = state.is_dynamic
    ident = jnp.arange(N, dtype=jnp.int32)
    if warm_start:
        reset = (state.step_count % RESET_PERIOD) == 0
        labels = jnp.where(reset, ident, jnp.minimum(state.island_id, ident))
        labels = jnp.where(state.island_id < 0, ident, labels)
    else:
        labels = ident

    def edges(a, b, valid):
        both_dyn = dyn[a] & dyn[b] & valid
        return a, b, both_dyn

    # contact edges are NEAR-CONTACT manifolds only (ones holding points):
    # pointless pairs at the admission margin have no reference equivalent
    # (reference manifolds exist within ~1.3*contact_breaking of contact)
    # and must not merge islands across the margin gap
    ca, cb, cv = edges(man.body_a, man.body_b,
                       man.valid & jnp.any(man.point_valid, -1))
    ja, jb, jv = edges(state.joints.body_a, state.joints.body_b,
                       state.joints.valid)
    ea = jnp.concatenate([ca, ja])
    eb = jnp.concatenate([cb, jb])
    ev = jnp.concatenate([cv, jv])
    big = jnp.int32(N)

    # dispatch-lean iteration: both endpoints gathered/scattered through ONE
    # concatenated index vector; the masked scatter index is loop-invariant
    E = ea.shape[0]
    eab = jnp.concatenate([ea, eb])
    evv = jnp.concatenate([ev, ev])
    idx_safe = jnp.where(evv, eab, 0)
    prev = labels
    for _ in range(num_iters):
        prev = labels
        l2 = labels[eab]
        m = jnp.where(ev, jnp.minimum(l2[:E], l2[E:]), big)
        labels = labels.at[idx_safe].min(jnp.concatenate([m, m]))
        labels = jnp.minimum(labels, labels[labels])  # pointer jumping
    return labels, jnp.all(labels == prev)


def exact_island_mask(state, seeds) -> "jnp.ndarray":
    """Host-side EXACT island membership for the given seed bodies: a bool
    [N] mask of every body transitively connected to any seed through
    dynamic-dynamic contact/joint edges (union-find over the live edge list).

    The on-device labels (``state.island_id``) are re-seeded every
    RESET_PERIOD steps and take 1-2 steps to re-converge, so a label match is
    NOT a reliable island test in that window. API-level consumers that need
    whole-island semantics (World.wake_up, extrapolation's island freeze) use
    this instead; the per-step sleep logic tolerates fragmentation (see
    compute_islands docstring) and keeps the cheap labels."""
    import numpy as np
    N = state.capacity
    dyn = np.asarray(state.is_dynamic)
    parent = np.arange(N, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    man, jt = state.contacts, state.joints
    ea = np.concatenate([np.asarray(man.body_a), np.asarray(jt.body_a)])
    eb = np.concatenate([np.asarray(man.body_b), np.asarray(jt.body_b)])
    man_pointed = np.asarray(man.valid) & np.asarray(man.point_valid).any(-1)
    ev = np.concatenate([man_pointed, np.asarray(jt.valid)])
    live = ev & dyn[ea] & dyn[eb]
    for a, b in zip(ea[live].tolist(), eb[live].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {find(int(s)) for s in np.atleast_1d(np.asarray(seeds))}
    mask = np.fromiter((find(i) in roots for i in range(N)), bool, N)
    return jnp.asarray(mask)


def update_sleep(state, man, dt: float, enable: bool, num_iters: int = 4,
                 wake_bodies=None, skip_labels=None):
    """Recompute island labels, advance sleep timers, and derive the asleep
    mask. Sleeping bodies' velocities are zeroed (the reference removes them
    from every system via sleeping_tag view exclusion; here the mask gates the
    solver and integration).

    ``wake_bodies`` is an optional [N] bool mask of bodies whose island must
    be forced awake this step (a contact-graph edge involving them was
    destroyed — reference island_manager.cpp:74-98 wake-on-edge-destroy).

    ``skip_labels`` (optional scalar bool) is the steady-state skip: when the
    contact/joint edge set has been unchanged long enough that a re-seed
    cycle completed within the stable window (stepper computes this from
    ``island_stable_steps``) AND the stored labels converged, the entire
    label propagation is bypassed under ``lax.cond`` and ``state.island_id``
    is reused — the reference's incremental island graph, which only
    recomputes on edge events (island_manager.cpp:74-98, :541-596)."""
    import jax

    def run(_):
        return compute_islands(state, man, num_iters)

    if skip_labels is None:
        labels, converged = run(None)
    else:
        labels, converged = jax.lax.cond(
            skip_labels & state.labels_stable,
            lambda _: (state.island_id, jnp.asarray(True)), run, None)
    if not enable:
        return dataclasses.replace(
            state, island_id=labels, labels_stable=converged,
            sleep_timer=jnp.zeros_like(state.sleep_timer),
            asleep=jnp.zeros_like(state.asleep))

    N = state.capacity
    dyn = state.is_dynamic
    lin_ok = vec.length_sqr(state.linvel) < ISLAND_LINEAR_SLEEP_THRESHOLD ** 2
    ang_ok = vec.length_sqr(state.angvel) < ISLAND_ANGULAR_SLEEP_THRESHOLD ** 2
    body_ok = (lin_ok & ang_ok & ~state.sleeping_disabled) | ~dyn

    # island_ok = AND over members (segment min); non-dynamic contribute True
    island_ok = jnp.ones((N,), bool).at[jnp.where(dyn, labels, 0)].min(
        jnp.where(dyn, body_ok, True))
    # kinematic neighbors that are moving keep the island awake (reference:
    # kinematic motion wakes touching islands)
    kin_moving = state.is_kinematic & ~(lin_ok & ang_ok)
    ea = jnp.concatenate([man.body_a, state.joints.body_a])
    eb = jnp.concatenate([man.body_b, state.joints.body_b])
    ev = jnp.concatenate([man.valid & jnp.any(man.point_valid, -1),
                          state.joints.valid])
    # both directions through one concatenated index: edge (this -> other)
    e_this = jnp.concatenate([ea, eb])
    e_other = jnp.concatenate([eb, ea])
    evv = jnp.concatenate([ev, ev])
    wake = evv & kin_moving[e_this] & dyn[e_other]
    island_ok = island_ok.at[jnp.where(wake, labels[e_other], 0)].min(~wake)
    if wake_bodies is not None:
        # destroyed-edge wake: the whole island of each flagged body
        force = wake_bodies & dyn
        island_ok = island_ok.at[jnp.where(force, labels, 0)].min(~force)

    my_ok = island_ok[labels] & dyn
    timer = jnp.where(my_ok, state.sleep_timer + dt, 0.0)
    asleep = (timer >= ISLAND_TIME_TO_SLEEP) & dyn
    linvel = jnp.where(asleep[:, None], 0.0, state.linvel)
    angvel = jnp.where(asleep[:, None], 0.0, state.angvel)
    return dataclasses.replace(state, island_id=labels, labels_stable=converged,
                               sleep_timer=timer, asleep=asleep,
                               linvel=linvel, angvel=angvel)
