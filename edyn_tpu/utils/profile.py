"""Observability: per-phase timers and world counters.

Reference: the EDYN_PROFILE_* macro timers writing profile_timers /
profile_counters ctx structs (util/profile_util.hpp:10-27,
context/profile.hpp:8-27). Inside a fused jit step there are no per-phase
timers, so profiling runs the step DECOMPOSED (each phase jitted separately,
like the reference's sequential mode) — a debug mode, not the hot path — and
counters are computed from the state on demand.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ProfileTimers:
    """reference: context/profile.hpp profile_timers."""
    broadphase: float = 0.0
    narrowphase: float = 0.0
    islands: float = 0.0
    restitution: float = 0.0
    prepare_constraints: float = 0.0
    solve: float = 0.0
    position_correction: float = 0.0
    step: float = 0.0


@dataclasses.dataclass
class ProfileCounters:
    """reference: context/profile.hpp profile_counters."""
    num_bodies: int = 0
    num_awake: int = 0
    num_manifolds: int = 0
    num_contact_points: int = 0
    num_constraints: int = 0
    num_islands: int = 0
    # capacity-overflow counters from the last step (0 = nothing truncated)
    dropped_broadphase_pairs: int = 0
    dropped_narrowphase_candidates: int = 0
    dropped_contact_rows: int = 0
    broadphase_window_alarms: int = 0
    dropped_manifold_slots: int = 0


def counters(state) -> ProfileCounters:
    valid = np.asarray(state.valid)
    dyn = np.asarray(state.is_dynamic)
    asleep = np.asarray(state.asleep)
    man_valid = np.asarray(state.contacts.valid)
    labels = np.asarray(state.island_id)[dyn & valid]
    ovf = np.asarray(state.overflow)
    return ProfileCounters(
        num_bodies=int(valid.sum()),
        num_awake=int((dyn & ~asleep).sum()),
        num_manifolds=int(man_valid.sum()),
        num_contact_points=int(np.asarray(state.contacts.point_valid).sum()),
        num_constraints=int(np.asarray(state.joints.valid).sum()),
        num_islands=len(np.unique(labels)) if len(labels) else 0,
        dropped_broadphase_pairs=int(ovf[0]),
        dropped_narrowphase_candidates=int(ovf[1]),
        dropped_contact_rows=int(ovf[2]),
        broadphase_window_alarms=int(ovf[3]),
        dropped_manifold_slots=int(ovf[4]) if ovf.shape[0] > 4 else 0,
    )


def profile_step(world, repeats: int = 3) -> Dict[str, float]:
    """Run one step decomposed and time each phase (ms). Compiles each phase
    separately on first call — use for diagnosis, not production stepping."""
    import dataclasses as dc
    from ..collision.broadphase import find_pairs
    from ..collision.manifold import update_slots
    from ..collision.narrowphase import update_contacts
    from ..dynamics import islands as im, solver as sm
    from ..dynamics.position import solve_positions
    from ..shapes.aabb import compute_aabbs

    st = world.state
    meta = world.meta
    S = world.settings
    out = {}

    def timed(name, fn, *args):
        res = fn(*args)
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        for _ in range(repeats):
            res = fn(*args)
        jax.block_until_ready(res)
        out[name] = (time.perf_counter() - t0) / repeats * 1e3
        return res

    amin, amax = timed("aabbs", jax.jit(lambda s: compute_aabbs(
        s.shape_type, s.shape_params, s.origin_pos(), s.orn, s.poly,
        s.shape_index, s.mesh, s.convex)), st)
    from ..config import PAIR_SEPARATION_MARGIN as _SEP
    import jax.numpy as _jnp
    swept = st.linvel * S.fixed_dt
    st = dc.replace(
        st, aabb_min=amin, aabb_max=amax,
        bp_aabb_min=_jnp.where(
            _jnp.any((amin + _jnp.minimum(swept, 0.0) < st.bp_aabb_min)
                     | (amax + _jnp.maximum(swept, 0.0) > st.bp_aabb_max),
                     -1)[:, None],
            amin + _jnp.minimum(swept, 0.0) - _SEP, st.bp_aabb_min),
        bp_aabb_max=_jnp.where(
            _jnp.any((amin + _jnp.minimum(swept, 0.0) < st.bp_aabb_min)
                     | (amax + _jnp.maximum(swept, 0.0) > st.bp_aabb_max),
                     -1)[:, None],
            amax + _jnp.maximum(swept, 0.0) + _SEP, st.bp_aabb_max))
    from ..collision.broadphase import DENSE_LIMIT, find_pairs_sweep
    mode = meta.broadphase_mode
    if mode == "auto":
        mode = "dense" if st.capacity <= DENSE_LIMIT else "sweep"
    if mode == "sweep":
        keys, pa, pb, pv, _, _al = timed(
            "broadphase", lambda s: find_pairs_sweep(
                s, meta.max_pairs, meta.sweep_window, meta.wide_cap), st)
    else:
        keys, pa, pb, pv, _ = timed(
            "broadphase", lambda s: find_pairs(s, meta.max_pairs,
                                               meta.broadphase_block), st)
    man, _edge_drop, _man_drop, _same = timed(
        "manifold_carry", jax.jit(update_slots), st.contacts, keys, pa, pb, pv)
    man, _np_drop = timed("narrowphase", jax.jit(
        lambda s, m: update_contacts(s, m, S.collision_threshold,
                                     meta.types_present, meta.bucket_cap)),
        st, man)
    st = timed("islands", jax.jit(
        lambda s, m: im.update_sleep(s, m, S.fixed_dt, S.enable_sleeping,
                                     meta.island_iters)), st, man)
    rows = timed("prepare_constraints", jax.jit(
        lambda s, m: sm.build_contact_rows(
            s, m, S.fixed_dt, S.num_restitution_iterations > 0,
            S.mass_splitting, meta.has_spin_roll, meta.max_rows)), st, man)
    if S.num_restitution_iterations > 0:
        timed("restitution", jax.jit(
            lambda s, r: sm.solve_restitution(
                s, r, S.num_restitution_iterations,
                S.num_individual_restitution_iterations, S.fixed_dt)), st, rows)

    def vel(rows, st):
        N = st.capacity
        R = rows.valid.shape[0]
        carry = (jnp.zeros((R, 6)), jnp.zeros((N, 6)))

        def it(_, c):
            return sm.solve_contacts_once(rows, *c)
        return jax.lax.fori_loop(0, S.num_solver_velocity_iterations, it, carry)

    timed("solve", jax.jit(vel), rows, st)
    timed("position_correction", jax.jit(
        lambda s, r: solve_positions(s, r, S.num_solver_position_iterations)),
        st, rows)

    from ..simulation.stepper import physics_step
    s0 = physics_step(world.state, S, meta)
    jax.block_until_ready(s0.pos)
    t0 = time.perf_counter()
    for _ in range(repeats):
        s0 = physics_step(s0, S, meta)
    jax.block_until_ready(s0.pos)
    out["full_step"] = (time.perf_counter() - t0) / repeats * 1e3
    return out
