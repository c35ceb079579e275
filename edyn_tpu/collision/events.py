"""Contact lifecycle events.

Reference: EnTT signal-based events — contact started via
on_construct<contact_started_tag>, contact ended via manifold/point
destruction (Design.md:135-139). With immutable state snapshots, events are a
set difference between two states' manifold tables.
"""
from __future__ import annotations

import numpy as np


def _touching_pairs(state) -> set:
    man = state.contacts
    valid = np.asarray(man.valid) & np.asarray(man.point_valid).any(axis=1)
    a = np.asarray(man.body_a)[valid]
    b = np.asarray(man.body_b)[valid]
    return set(zip(a.tolist(), b.tolist()))


def contact_events(prev_state, new_state):
    """Returns (started, ended): lists of (body_a, body_b) pairs whose
    manifolds gained/lost touching points between the two states."""
    before = _touching_pairs(prev_state)
    after = _touching_pairs(new_state)
    return sorted(after - before), sorted(before - after)


def query_aabb(state, lo, hi, include_non_procedural=True):
    """Entities whose AABB intersects [lo, hi] (reference:
    include/edyn/collision/query_aabb.hpp async AABB queries)."""
    amin = np.asarray(state.aabb_min)
    amax = np.asarray(state.aabb_max)
    valid = np.asarray(state.valid)
    m = (amin <= np.asarray(hi)).all(axis=1) & \
        (amax >= np.asarray(lo)).all(axis=1) & valid
    if not include_non_procedural:
        m &= np.asarray(state.is_dynamic)
    return np.nonzero(m)[0].tolist()
