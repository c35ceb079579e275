"""The fixed-dt simulation step: one fused jit program.

Replaces the reference's per-step pipeline (stepper_sequential::update,
src/edyn/simulation/stepper_sequential.cpp:28-152 and solver::update,
src/edyn/dynamics/solver.cpp:387-468) with a single XLA-compiled function over
the world pytree. Phase order matches the reference invariant (SURVEY A.7):

  broadphase -> narrowphase -> islands -> (restitution -> gravity -> prepare
  -> warm start -> velocity iterations -> integrate -> position iterations)
  -> AABB refresh (at next step's broadphase)

The multi-step accumulator loop lives host-side in World.update (like the
reference's accumulator, stepper_sequential.cpp:45-65).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..collision.broadphase import find_pairs
from ..collision.manifold import update_slots
from ..collision.narrowphase import update_contacts
from ..config import Settings
from ..constraints import joints as joints_mod
from ..dynamics import islands as islands_mod
from ..dynamics import solver as solver_mod
from ..dynamics.position import solve_positions
from ..math import quat, vec
from ..shapes.aabb import compute_aabbs


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Static scene facts (hashable -> jit static arg): which shape types
    exist, and the padded capacities. Changing these triggers a re-trace,
    the analogue of the reference's init-time configuration."""
    types_present: frozenset
    max_pairs: int
    bucket_cap: int | None = None
    # label-propagation rounds per step (warm-started across steps +
    # periodic reseed; see dynamics/islands.py)
    island_iters: int = 4
    broadphase_block: int = 256
    # broadphase algorithm: "auto" = dense below DENSE_LIMIT bodies, sweep
    # above. "dense" = one-shot [N,N] mask — O(N^2) work but SORT-FREE, which
    # wins on launch-overhead-bound runtimes (XLA sort lowers to ~log^2(n)
    # dispatch passes; measured slower than the N^2 mask at 10k). "sweep" =
    # sort-and-sweep + wide-body rows — O(N*window), the 50k+ scaling path.
    broadphase_mode: str = "auto"
    sweep_window: int = 192
    wide_cap: int = 64
    # contact-row budget: rows are compacted to live contacts (manifolds are
    # padded x4); None = no compaction
    max_rows: int | None = None
    # static scene fact: any spin/rolling-friction materials present (skips
    # the spin/roll row machinery entirely when False)
    has_spin_roll: bool = True
    # static scene fact: any joints allocated (a joint-free scene skips the
    # joint row build + per-iteration joint solve — each is several dispatches
    # on a launch-overhead-bound runtime)
    has_joints: bool = True
    # unified-bucket Pallas mega-kernel: None = auto (on for TPU backends,
    # off for CPU), True/False = force
    pallas_narrowphase: object = None
    # solver iteration math as Pallas kernels (velocity, restitution inner,
    # NGS — dynamics/pallas_solver.py): None = auto (TPU backends, single
    # chip), True/False = force. Forcing True on CPU runs interpret mode
    # (slow; tests only).
    pallas_solver: object = None
    # sleep/width gating: when the live compacted row count fits in a
    # 1/16-width prefix, the whole solve phase runs on that slice under
    # lax.cond (mostly-asleep worlds stop paying full solver width)
    sleep_gating: bool = True
    # optional custom pair filter fn(state, i_idx, j_idx) -> bool mask,
    # applied on top of the default filters (reference:
    # settings.should_collide_func, context/settings.hpp:43). Must be a
    # jittable pure function; identity-hashed as a static arg.
    should_collide_fn: object = None
    # multi-chip: (mesh, axis_name) to pin ROW-space intermediates (contact
    # rows, impulse carries) to a leading-axis sharding. Without this GSPMD
    # replicates them and all-reduces row-sized arrays every iteration
    # (measured: 5x [R,6] all-reduces per step at 8 devices); with it the
    # collectives shrink to body-space [N,6] sums. Set by make_sharded_step.
    shard_mesh: object = None


def _shard_rows(tree, meta):
    """Constrain every [R,...]-leading leaf to the mesh's body axis (no-op
    without a shard_mesh)."""
    if meta.shard_mesh is None:
        return tree
    mesh, axis = meta.shard_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    def c(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] >= mesh.size \
                and leaf.shape[0] % mesh.size == 0:
            return jax.lax.with_sharding_constraint(
                leaf, NamedSharding(mesh, P(axis)))
        return leaf

    return jax.tree.map(c, tree)


def apply_gravity(state, dt: float):
    """reference: include/edyn/sys/apply_gravity.hpp:12."""
    active = state.awake_dynamic
    linvel = jnp.where(active[:, None], state.linvel + state.gravity * dt,
                       state.linvel)
    return dataclasses.replace(state, linvel=linvel)


def integrate_velocities(state, dv, dw, dt: float):
    """Apply solver deltas and integrate transforms (reference:
    island_solver.cpp:358-376 integrate_velocities)."""
    active = state.awake_dynamic
    linvel = jnp.where(active[:, None], state.linvel + dv, state.linvel)
    angvel = jnp.where(active[:, None], state.angvel + dw, state.angvel)
    moving = active | (state.is_kinematic & state.valid)
    pos = jnp.where(moving[:, None], state.pos + linvel * dt, state.pos)
    orn = jnp.where(moving[:, None], quat.integrate(state.orn, angvel, dt),
                    state.orn)
    return dataclasses.replace(state, linvel=linvel, angvel=angvel, pos=pos,
                               orn=orn)


def _tpu_backend():
    import jax as _jax
    try:
        b = _jax.default_backend()
        return b == "tpu" or b.startswith("tpu") or b == "axon"
    except Exception:
        return False


def _use_pallas_solver(meta: SceneMeta):
    """Static decision: run the solver iteration math as Pallas kernels
    (dynamics/pallas_solver.py). Off under multi-chip sharding (the
    transposed [6,N] delta layout doesn't carry the row-axis sharding
    constraints) and off on non-TPU backends unless forced."""
    if meta.shard_mesh is not None:
        return False
    if meta.pallas_solver is not None:
        return bool(meta.pallas_solver)
    return _tpu_backend()


def _solve_phase(state, man, rows, settings: Settings, meta: SceneMeta,
                 use_rest: bool):
    """Everything row-dependent between narrowphase and the step epilogue:
    restitution pre-pass -> gravity -> rhs refresh -> joint rows -> warm
    start -> velocity iterations -> impulse writeback -> integrate -> NGS.
    Called under the sleep-gating lax.cond with either the full or a
    prefix-sliced contact row table (see physics_step_impl)."""
    dt = settings.fixed_dt

    use_ps = _use_pallas_solver(meta)
    if use_ps:
        from ..dynamics import pallas_solver as ps
        interp = not _tpu_backend()
        tbl, a_p, b_p, Rp = ps.pack_rows_t(rows)
        ab_p = jnp.concatenate([a_p, b_p])

    # --- restitution pre-pass (before gravity; reference solver.cpp:387-400) ---
    if use_rest:
        if use_ps:
            linvel, angvel = solver_mod.solve_restitution_pallas(
                state, rows, tbl, ab_p,
                settings.num_restitution_iterations,
                settings.num_individual_restitution_iterations,
                interpret=interp)
        else:
            linvel, angvel = solver_mod.solve_restitution(
                state, rows, settings.num_restitution_iterations,
                settings.num_individual_restitution_iterations, dt)
        state = dataclasses.replace(state, linvel=linvel, angvel=angvel)

    # --- gravity ---
    state = apply_gravity(state, dt)

    # --- refresh rhs against post-gravity velocities ---
    rows = solver_mod.refresh_contact_rhs(rows, state, man, dt, use_rest)
    if use_ps:
        # refresh the rhs rows of the packed table in place (rhs_n 48 |
        # rhs_t1 49 | rhs_t2 50; spin/roll rhs at C_BASE+27:30)
        R = rows.valid.shape[0]
        pad = Rp - R

        def prhs(*xs):
            s = jnp.stack([x.astype(jnp.float32) for x in xs])
            return jnp.pad(s, ((0, 0), (0, pad))) if pad else s

        tbl = tbl.at[48:51].set(prhs(rows.rn.rhs, rows.r1.rhs, rows.r2.rhs))
        if rows.sA_n is not None:
            base = ps.C_BASE
            tbl = tbl.at[base + 27:base + 30].set(
                prhs(rows.rhs_spin, rows.rhs_roll1, rows.rhs_roll2))
    if meta.has_joints:
        jrows, new_jangle = joints_mod.build_joint_rows(
            state, dt, settings.mass_splitting)
    else:
        jrows, new_jangle = None, state.joints.angle

    # --- warm start + velocity iterations ---
    # body velocity deltas are packed [N,6] (lin 0:3, ang 3:6) so every
    # iteration is ONE gather + ONE scatter (see solver.py dispatch design)
    N = state.capacity
    dvw = jnp.zeros((N, 6))
    M, P = man.point_valid.shape
    slot = rows.row_slot
    # packed impulse gather: [M,4,6] = n 0 | f 1:3 | s 3 | r 4:6
    imp_packed = jnp.concatenate([
        man.normal_impulse[..., None], man.friction_impulse,
        man.spin_impulse[..., None], man.roll_impulse], axis=-1)
    imp6 = _shard_rows(imp_packed.reshape(M * P, 6)[slot], meta)
    dvw = solver_mod.warm_start_contacts(rows, imp6, dvw)
    j_imp = state.joints.impulses
    if meta.has_joints:
        dvw = joints_mod.warm_start_joints(jrows, j_imp, dvw)

    if use_ps:
        # Pallas path: deltas travel TRANSPOSED [6,N]; each iteration is
        # gather -> ONE kernel -> scatter-add (3-4 dispatches vs ~20 for the
        # fused-jnp chain). Unrolled: the per-iteration program is tiny.
        R = rows.valid.shape[0]
        pad = Rp - R
        with_sr = rows.sA_n is not None
        imp_t = (jnp.pad(imp6, ((0, pad), (0, 0))) if pad else imp6).T
        dvw_t = dvw.T
        for _ in range(settings.num_solver_velocity_iterations):
            g = dvw_t[:, ab_p]
            imp_t, upd = ps.solve_iteration_pallas(tbl, imp_t, g, with_sr,
                                                   interpret=interp)
            dvw_t = dvw_t.at[:, ab_p].add(
                jnp.concatenate([upd[:6], upd[6:]], axis=1))
            if meta.has_joints:
                dvw = dvw_t.T
                j_imp, dvw = joints_mod.solve_joints_once(jrows, j_imp, dvw)
                dvw_t = dvw.T
        dvw = dvw_t.T
        imp6 = imp_t.T[:R]
    else:
        def iteration(_, carry):
            imp6, j_i, dvw = carry
            imp6, dvw = solver_mod.solve_contacts_once(rows, imp6, dvw)
            imp6 = _shard_rows(imp6, meta)
            if meta.has_joints:
                j_i, dvw = joints_mod.solve_joints_once(jrows, j_i, dvw)
            return imp6, j_i, dvw

        imp6, j_imp, dvw = jax.lax.fori_loop(
            0, settings.num_solver_velocity_iterations, iteration,
            (imp6, j_imp, dvw))

    # store applied impulses for next-step warm starting (reference:
    # island_solver.cpp assign_applied_impulses): ONE packed scatter through
    # the row compaction map (invalid rows routed out of range and dropped)
    slot_w = jnp.where(rows.valid, slot, M * P)
    flat_imp = imp_packed.reshape(M * P, 6).at[slot_w].set(
        imp6, mode="drop").reshape(M, P, 6)
    man = dataclasses.replace(
        man,
        normal_impulse=flat_imp[..., 0],
        friction_impulse=flat_imp[..., 1:3],
        spin_impulse=flat_imp[..., 3],
        roll_impulse=flat_imp[..., 4:6])
    joints = dataclasses.replace(state.joints, impulses=j_imp,
                                 angle=new_jangle)
    state = dataclasses.replace(state, contacts=man, joints=joints)

    # --- integrate ---
    state = integrate_velocities(state, dvw[:, 0:3], dvw[:, 3:6], dt)

    # --- position correction (reuses the compacted contact rows) ---
    if use_ps:
        from ..dynamics.position import solve_positions_pallas
        state = solve_positions_pallas(
            state, rows, tbl, ab_p,
            settings.num_solver_position_iterations, interpret=interp)
    else:
        state = solve_positions(state, rows,
                                settings.num_solver_position_iterations)
    if meta.has_joints:
        state = joints_mod.solve_joint_positions(
            state, settings.num_solver_position_iterations)
    return state


def physics_step_impl(state, settings: Settings, meta: SceneMeta):
    """One fixed-dt step of the whole world (unjitted; see physics_step)."""
    dt = settings.fixed_dt

    # --- AABBs (reference: sys/update_aabbs) ---
    amin, amax = compute_aabbs(state.shape_type, state.shape_params,
                               state.origin_pos(), state.orn, state.poly,
                               state.shape_index, state.mesh, state.convex)
    # pair-admission boxes, CARRIED with hysteresis: on re-seat, a body's box
    # is its tight AABB swept by this step's velocity and inflated by the
    # separation margin; it is only re-seated when the swept tight AABB
    # escapes the carried box (reference: broadphase queries offset AABBs,
    # manifolds are created within ~contact_breaking and destroyed at
    # 1.3x contact_breaking, broadphase.hpp:15-18 — the same
    # create-tight/destroy-wide hysteresis band, here 1x..2x the margin).
    # Tight admission keeps manifold-table width at the near-contact count
    # instead of a fat-margin candidate set (~2x), and the carry makes the
    # pair set EXACTLY stable under solver-scale jitter (< margin): a
    # settled or sleeping world re-seats nothing, emits an identical key
    # list, and update_slots takes its no-op fast path. The sweep term
    # admits fast approaches the step they arrive, which is what the
    # speculative contact row needs.
    from ..config import PAIR_SEPARATION_MARGIN as _SEP
    swept = state.linvel * dt
    tmin = amin + jnp.minimum(swept, 0.0)
    tmax = amax + jnp.maximum(swept, 0.0)
    escaped = jnp.any((tmin < state.bp_aabb_min)
                      | (tmax > state.bp_aabb_max), axis=-1)
    bp_min = jnp.where(escaped[:, None], tmin - _SEP, state.bp_aabb_min)
    bp_max = jnp.where(escaped[:, None], tmax + _SEP, state.bp_aabb_max)
    state = dataclasses.replace(state, aabb_min=amin, aabb_max=amax,
                                bp_aabb_min=bp_min, bp_aabb_max=bp_max)

    # --- broadphase (skipped entirely when no admission box re-seated) ---
    from ..collision.broadphase import (DENSE_LIMIT, INVALID_KEY,
                                        find_pairs_sweep)
    mode = meta.broadphase_mode
    if mode == "auto":
        mode = "dense" if state.capacity <= DENSE_LIMIT else "sweep"

    def compute_pairs(_):
        if mode == "sweep":
            return find_pairs_sweep(
                state, meta.max_pairs, meta.sweep_window, meta.wide_cap,
                meta.should_collide_fn)
        k, a, b, v, d = find_pairs(
            state, meta.max_pairs, meta.broadphase_block,
            meta.should_collide_fn, wide_cap=meta.wide_cap)
        return k, a, b, v, d, jnp.zeros((), jnp.int32)

    # Pair-list carry: the admitted pair set is a pure function of the
    # carried admission boxes + host-mutable filters. If NO valid body's
    # box re-seated this step and no host mutation touched the filters
    # (bp_carry_ok), last step's sorted pair list (stored on the manifold
    # table as its sorted view) is bit-identical to what find_pairs would
    # emit — reuse it and skip the whole mask/extraction under lax.cond
    # (reference: dynamic_tree::move returns false for non-escaping AABBs
    # and broadphase re-queries nothing, dynamic_tree.cpp:60-77). A custom
    # should_collide_fn may read arbitrary state, so it disables the carry.
    from ..shapes.params import ShapeType
    validb = state.valid & (state.shape_type != ShapeType.NONE)
    can_reuse = (state.bp_carry_ok & ~jnp.any(escaped & validb)
                 if meta.should_collide_fn is None else jnp.bool_(False))

    def reuse_pairs(_):
        P = meta.max_pairs
        Ncap = state.capacity
        k = state.contacts.sort_key[:P]
        v = state.contacts.sort_pvalid[:P]
        ok = k != INVALID_KEY
        a = jnp.where(ok, k // Ncap, 0).astype(jnp.int32)
        b = jnp.where(ok, k % Ncap, 0).astype(jnp.int32)
        z = jnp.zeros((), jnp.int32)
        return k, a, b, v, z, z

    keys, pa, pb, pvalid, bp_dropped, bp_alarms = jax.lax.cond(
        can_reuse, reuse_pairs, compute_pairs, None)
    state = dataclasses.replace(state, bp_carry_ok=jnp.bool_(True))

    # --- manifold persistence + narrowphase ---
    man, edge_dropped, man_dropped, pairs_same = update_slots(
        state.contacts, keys, pa, pb, pvalid)
    # bodies whose manifold was destroyed this step must wake (reference:
    # island_manager.cpp:74-98 wakes an island when a graph edge dies, e.g.
    # the body underneath a sleeping stack is destroyed or drifts away)
    old = state.contacts
    # Only drops of NEAR-CONTACT manifolds (ones that held contact points)
    # wake: pointless pairs at the admission margin (separated by more than
    # contact_breaking) flicker freely; the reference fires on_destroy island
    # wakes only for manifolds, which exist within ~1.3*contact_breaking
    # (broadphase.hpp:15-18).
    edge_wake = edge_dropped & jnp.any(old.point_valid, -1)
    wake_bodies = (
        jnp.zeros((state.capacity,), bool)
        .at[jnp.where(edge_wake, old.body_a, 0)].max(edge_wake)
        .at[jnp.where(edge_wake, old.body_b, 0)].max(edge_wake))
    man, np_dropped = update_contacts(state, man, settings.collision_threshold,
                                      meta.types_present, meta.bucket_cap, dt,
                                      pallas_mode=meta.pallas_narrowphase)

    # --- islands & sleeping ---
    # Steady-state skip: the island graph's edges are the pointed manifolds
    # + joints. When the admitted pair list AND the pointed mask have been
    # unchanged for >= 2*RESET_PERIOD steps, a re-seed cycle completed
    # within the stable window, so the stored converged labels are the
    # exact partition of the current graph and label propagation is skipped
    # under lax.cond (reference: the island graph is incremental and only
    # recomputes on edge events, island_manager.cpp:74-98). Host-side body/
    # joint lifecycle mutators reset island_stable_steps (core/world.py).
    pointed = man.valid & jnp.any(man.point_valid, -1)
    steady = pairs_same & jnp.all(pointed == state.edge_pointed)
    stable_steps = jnp.where(steady, state.island_stable_steps + 1, 0)
    state = dataclasses.replace(state, contacts=man, edge_pointed=pointed,
                                island_stable_steps=stable_steps)
    skip_labels = stable_steps >= 2 * islands_mod.RESET_PERIOD
    state = islands_mod.update_sleep(state, man, dt, settings.enable_sleeping,
                                     meta.island_iters, wake_bodies=wake_bodies,
                                     skip_labels=skip_labels)

    use_rest = settings.num_restitution_iterations > 0
    rows = solver_mod.build_contact_rows(state, man, dt, use_rest,
                                         settings.mass_splitting,
                                         meta.has_spin_roll, meta.max_rows)
    rows = _shard_rows(rows, meta)

    # --- solve phase, width-laddered on the live row count (sleep gating) ---
    # Rows are compacted into a prefix, so the ENTIRE solve phase —
    # restitution pre-pass, warm start, velocity iterations, impulse
    # writeback, NGS — runs on the narrowest prefix that holds the live
    # rows, via nested lax.cond. Tiers: R/8 (mostly-asleep worlds — the
    # reference's "sleeping islands cost nothing", island_manager.cpp:541-596),
    # 3R/4 (a settled pile: live points run ~0.75/pair), full R. Numerics
    # are identical across tiers: the live rows are the same rows, padding
    # contributes zeros either way. The gather/scatter cost of every solver
    # iteration scales with the chosen width (~6 ns per gathered index), so
    # the tier choice is directly the solve-phase cost.
    Rfull = rows.valid.shape[0]
    tiers = []
    if meta.sleep_gating and meta.max_rows is not None:
        mult = meta.shard_mesh[0].size if meta.shard_mesh is not None else 1
        quantum = 256 * mult
        for frac_num, frac_den in ((1, 8), (3, 4)):
            Rs = max(quantum, -(-(Rfull * frac_num // frac_den) // quantum)
                     * quantum)
            if Rs < Rfull and (not tiers or Rs > tiers[-1]):
                tiers.append(Rs)

    def solve_at(width):
        if width == Rfull:
            return lambda st: _solve_phase(st, man, rows, settings, meta,
                                           use_rest)
        return lambda st: _solve_phase(
            st, man, solver_mod.rows_prefix(rows, width), settings, meta,
            use_rest)

    def ladder(remaining):
        if not remaining:
            return solve_at(Rfull)
        Rs = remaining[0]
        rest = ladder(remaining[1:])
        return lambda st: jax.lax.cond(rows.count <= Rs, solve_at(Rs), rest, st)

    state = ladder(tiers)(state)

    return dataclasses.replace(
        state,
        step_count=state.step_count + 1,
        sim_time=state.sim_time + dt,
        # surface every silent capacity truncation (broadphase pairs,
        # narrowphase bucket candidates, compacted solver rows)
        overflow=jnp.stack([
            bp_dropped.astype(jnp.int32), np_dropped.astype(jnp.int32),
            rows.dropped.astype(jnp.int32), bp_alarms.astype(jnp.int32),
            man_dropped.astype(jnp.int32)]),
    )


# NOTE: deliberately NO buffer donation. Measured on the axon relay the
# per-leaf output copies fully overlap with the dispatch stream (1.89 vs 1.93
# steps/s at 10k bodies), and donation would delete pre-step snapshots that
# the immutable-state architecture hands out freely (contact_events'
# prev_state, the async worker's published snapshot). Revisit only if a
# runtime shows the copies on the critical path.
physics_step = jax.jit(physics_step_impl, static_argnames=("settings", "meta"))


def _step_n_impl(state, n, settings: Settings, meta: SceneMeta):
    """n fixed steps as ONE compiled program (reference analogue: the tight
    step loop in stepper_sequential.cpp:71-102). ``n`` is a traced scalar so
    every trip count shares one executable; XLA's while-loop carry reuses the
    state buffers in place, eliminating the per-step host dispatch and the
    per-step output copy of the host loop in World.step."""
    return jax.lax.fori_loop(
        0, n, lambda _, st: physics_step_impl(st, settings, meta), state)


physics_step_n = jax.jit(_step_n_impl, static_argnames=("settings", "meta"))
# donating variant: the caller's input state buffers are consumed. Only safe
# when no references to the previous state's leaves are held (bench loops);
# World.step_n exposes it behind donate=True.
physics_step_n_donated = jax.jit(_step_n_impl,
                                 static_argnames=("settings", "meta"),
                                 donate_argnums=0)
