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

    def body(_, carry):
        dpos, dang = carry
        corr_rel = (dpos[a] + vec.cross(dang[a], rA)
                    - dpos[b] - vec.cross(dang[b], rB))
        dist = base_dist + vec.dot(corr_rel, n)
        error = jnp.clip(-dist, 0.0, MAX_CORRECTION)
        lam = jnp.where(valid, error * CONTACT_POSITION_CORRECTION_RATE * em,
                        0.0)[:, None]
        dpos = dpos.at[a].add(inv_mA[:, None] * n * lam)
        dpos = dpos.at[b].add(inv_mB[:, None] * -n * lam)
        dang = dang.at[a].add(tA * lam)
        dang = dang.at[b].add(tB * lam)
        return dpos, dang

    zero = jnp.zeros_like(state.pos)
    dpos, dang = jax.lax.fori_loop(0, num_iterations, body, (zero, zero))
    # bound the per-step correction — beyond this the linearization is
    # invalid and applying it adds energy
    dang = vec.clamp_length(dang, 0.2)
    dpos = vec.clamp_length(dpos, 3 * MAX_CORRECTION)
    return dataclasses.replace(
        state,
        pos=state.pos + dpos,
        orn=quat.integrate(state.orn, dang, 1.0))
