"""Nonlinear Gauss-Seidel position correction (batched NGS, linearized).

Reference: position_solver (include/edyn/dynamics/position_solver.hpp:13-52)
driven per contact by contact_constraint::solve_position
(src/edyn/constraints/contact_constraint.cpp:60-94, credited to Box2D's
b2_contact_solver): per iteration, recompute pivots/normal and apply
error * correction_rate directly to positions/orientations.

TPU formulation: REUSES the velocity solver's compacted contact rows
(jacobians, normals, effective masses, step-start separations) — corrections
per step are a few mm/mrad, so the per-iteration re-rotation the reference
does changes them negligibly. Each of the 3 iterations is a cheap
gather->dot->scatter round; the positional error tracks the evolving
correction to first order (including lever rotation), with Box2D-style
per-iteration error clamping and bounded per-step corrections (outside that
range the linearization would add energy). Soft contacts are excluded
(springs penetrate by design).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CONTACT_POSITION_CORRECTION_RATE
from ..math import quat, vec

MAX_CORRECTION = 0.05  # metres of positional error consumed per iteration


def solve_positions_pallas(state, rows, tbl, ab_p, num_iterations: int,
                           interpret: bool = False):
    """solve_positions with the per-iteration math as ONE Pallas kernel
    (dynamics/pallas_solver.py). Semantics identical to solve_positions
    (tested in tests/test_pallas_solver.py)."""
    if num_iterations <= 0:
        return state
    from . import pallas_solver as ps

    ERROR_EXIT = 0.005
    N = state.pos.shape[0]

    def cond(carry):
        it, dpq_t, go = carry
        return (it < num_iterations) & go

    def body(carry):
        it, dpq_t, _ = carry
        g = dpq_t[:, ab_p]
        upd, err = ps.ngs_iteration_pallas(
            tbl, g, float(CONTACT_POSITION_CORRECTION_RATE),
            float(MAX_CORRECTION), interpret=interpret)
        go = jnp.max(err) >= ERROR_EXIT
        dpq_t = dpq_t.at[:, ab_p].add(
            jnp.concatenate([upd[:6], upd[6:]], axis=1))
        return it + 1, dpq_t, go

    _, dpq_t, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((6, N)), jnp.bool_(True)))
    dpq = dpq_t.T
    dpos, dang = dpq[:, 0:3], dpq[:, 3:6]
    dang = vec.clamp_length(dang, 0.2)
    dpos = vec.clamp_length(dpos, 3 * MAX_CORRECTION)
    return dataclasses.replace(
        state,
        pos=state.pos + dpos,
        orn=quat.integrate(state.orn, dang, 1.0))


def solve_positions(state, rows, num_iterations: int):
    if num_iterations <= 0:
        return state
    valid = rows.valid & ~rows.soft
    a, b = rows.a, rows.b
    n = rows.n
    rA, rB = rows.rA, rows.rB
    inv_mA = jnp.where(valid, rows.inv_mA, 0.0)
    inv_mB = jnp.where(valid, rows.inv_mB, 0.0)
    tA, tB = rows.rn.tA, rows.rn.tB
    em = rows.rn.eff_mass
    base_dist = rows.base_dist

    from .solver import gather_ab, scatter_add_ab

    # convergence exit matching the reference (island_solver.cpp:350-353:
    # stop when max error < 0.005) — settled scenes run ONE iteration's
    # worth of dispatches instead of all three
    ERROR_EXIT = 0.005

    def cond(carry):
        it, dpq, go = carry
        return (it < num_iterations) & go

    def body(carry):
        it, dpq, _ = carry
        dpa, daa, dpb, dab_ = gather_ab(dpq, rows.ab)
        corr_rel = (dpa + vec.cross(daa, rA) - dpb - vec.cross(dab_, rB))
        dist = base_dist + vec.dot(corr_rel, n)
        error = jnp.clip(-dist, 0.0, MAX_CORRECTION)
        error = jnp.where(valid, error, 0.0)
        go = jnp.max(error) >= ERROR_EXIT
        lam = (error * CONTACT_POSITION_CORRECTION_RATE * em)[:, None]
        dpq = scatter_add_ab(dpq, rows.ab, inv_mA[:, None] * n * lam,
                             tA * lam, inv_mB[:, None] * -n * lam, tB * lam)
        return it + 1, dpq, go

    N = state.pos.shape[0]
    _, dpq, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((N, 6)), jnp.bool_(True)))
    dpos, dang = dpq[:, 0:3], dpq[:, 3:6]
    # bound the per-step correction — beyond this the linearization is
    # invalid and applying it adds energy
    dang = vec.clamp_length(dang, 0.2)
    dpos = vec.clamp_length(dpos, 3 * MAX_CORRECTION)
    return dataclasses.replace(
        state,
        pos=state.pos + dpos,
        orn=quat.integrate(state.orn, dang, 1.0))
