"""Nonlinear Gauss-Seidel position correction (batched NGS, linearized).

Reference: position_solver (include/edyn/dynamics/position_solver.hpp:13-52)
driven per contact by contact_constraint::solve_position
(src/edyn/constraints/contact_constraint.cpp:60-94, credited to Box2D's
b2_contact_solver): per iteration, recompute pivots/normal and apply
error * correction_rate directly to positions/orientations.

TPU formulation: jacobians, normals and effective masses are LINEARIZED at
step-start orientations (corrections per step are a few mm/мrad, so the
re-rotation the reference does per iteration changes them negligibly), which
makes each of the 3 iterations a cheap gather->dot->scatter round; positional
error does track the evolving positions AND the accumulated angular
correction via the rotating-lever first-order term. Soft contacts are
excluded (springs penetrate by design).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CONTACT_POSITION_CORRECTION_RATE, LARGE_SCALAR

MAX_CORRECTION = 0.05  # metres of positional error consumed per iteration
from ..math import quat, vec
from .solver import degree_counts


def solve_positions(state, man, num_iterations: int):
    if num_iterations <= 0:
        return state
    M, P = man.point_valid.shape
    R = M * P
    flat = lambda x: x.reshape((R,) + x.shape[2:])

    a = flat(jnp.broadcast_to(man.body_a[:, None], (M, P)))
    b = flat(jnp.broadcast_to(man.body_b[:, None], (M, P)))
    valid = flat(man.point_valid & man.valid[:, None])
    valid &= state.has_material[a] & state.has_material[b]
    valid &= ~(state.asleep[a] & state.asleep[b])
    # soft (spring) contacts penetrate by design — no positional correction
    stiff = 1.0 / (1.0 / jnp.maximum(state.stiffness[a], 1.0)
                   + 1.0 / jnp.maximum(state.stiffness[b], 1.0))
    valid &= stiff >= LARGE_SCALAR

    orn_a = state.orn[a]
    orn_b = state.orn[b]
    attach = flat(man.normal_attachment)
    ln = flat(man.local_normal)
    n = jnp.where((attach == 1)[:, None], quat.rotate(orn_a, ln),
                  jnp.where((attach == 2)[:, None], quat.rotate(orn_b, ln), ln))
    rA = quat.rotate(orn_a, flat(man.pivot_a))
    rB = quat.rotate(orn_b, flat(man.pivot_b))

    inv_mA = jnp.where(valid, state.mass_inv[a], 0.0)
    inv_mB = jnp.where(valid, state.mass_inv[b], 0.0)
    Iw = state.inertia_world_inv()
    inv_IA = Iw[a] * valid[:, None, None]
    inv_IB = Iw[b] * valid[:, None, None]
    deg = degree_counts(state.capacity, [a, b], [valid, valid])

    JaA = jnp.cross(rA, n)
    JaB = -jnp.cross(rB, n)
    tA = jnp.einsum("rij,rj->ri", inv_IA, JaA)
    tB = jnp.einsum("rij,rj->ri", inv_IB, JaB)
    term = (inv_mA * deg[a] + vec.dot(tA, JaA) * deg[a]
            + inv_mB * deg[b] + vec.dot(tB, JaB) * deg[b])
    em = jnp.where(term > 1e-12, 1.0 / jnp.maximum(term, 1e-12), 0.0)

    # signed separation at step start; iterations update it to first order
    base_dist = flat(man.distance)

    def body(_, carry):
        dpos, dang = carry
        # current separation: base + normal-projected relative correction,
        # including the lever rotation first-order term (dang x r)
        corr_rel = (dpos[a] + jnp.cross(dang[a], rA)
                    - dpos[b] - jnp.cross(dang[b], rB))
        dist = base_dist + vec.dot(corr_rel, n)
        # clamp per-iteration error like Box2D's b2_maxLinearCorrection so the
        # linearization stays in its validity range (also bounds feedback for
        # thin bodies with large angular compliance)
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
    # bound the per-step angular correction — beyond this the linearization
    # is invalid and applying it adds energy
    dang = vec.clamp_length(dang, 0.2)
    dpos = vec.clamp_length(dpos, 3 * MAX_CORRECTION)
    return dataclasses.replace(
        state,
        pos=state.pos + dpos,
        orn=quat.integrate(state.orn, dang, 1.0))
