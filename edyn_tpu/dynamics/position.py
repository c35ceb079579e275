"""Nonlinear Gauss-Seidel position correction (batched NGS).

Reference: position_solver (include/edyn/dynamics/position_solver.hpp:13-52)
driven per contact by contact_constraint::solve_position
(src/edyn/constraints/contact_constraint.cpp:60-94, credited to Box2D's
b2_contact_solver): per iteration, recompute world pivots and the attached
normal from the *current* transforms, error = -distance, apply
error * correction_rate directly to positions/orientations with freshly
rotated inverse inertia. Batched here with the same mass-splitting degree
scaling as the velocity solver.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CONTACT_POSITION_CORRECTION_RATE
from ..math import quat, vec
from .solver import degree_counts, eff_mass_of


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
    # (reference: contact_extras replaces the rigid contact constraint)
    from ..config import LARGE_SCALAR
    stiff = 1.0 / (1.0 / jnp.maximum(state.stiffness[a], 1.0)
                   + 1.0 / jnp.maximum(state.stiffness[b], 1.0))
    valid &= stiff >= LARGE_SCALAR
    attach = flat(man.normal_attachment)
    ln = flat(man.local_normal)
    piv_a = flat(man.pivot_a)
    piv_b = flat(man.pivot_b)
    inv_mA = jnp.where(valid, state.mass_inv[a], 0.0)
    inv_mB = jnp.where(valid, state.mass_inv[b], 0.0)
    deg = degree_counts(state.capacity, [a, b], [valid, valid])

    inertia_inv = state.inertia_inv

    def body(_, carry):
        pos, orn = carry
        orn_a = orn[a]
        orn_b = orn[b]
        pa_w = pos[a] + quat.rotate(orn_a, piv_a)
        pb_w = pos[b] + quat.rotate(orn_b, piv_b)
        n = jnp.where((attach == 1)[:, None], quat.rotate(orn_a, ln),
                      jnp.where((attach == 2)[:, None], quat.rotate(orn_b, ln), ln))
        dist = vec.dot(pa_w - pb_w, n)
        error = jnp.maximum(-dist, 0.0)

        rA = pa_w - pos[a]
        rB = pb_w - pos[b]
        Ra = quat.to_matrix(orn_a)
        Rb = quat.to_matrix(orn_b)
        inv_IA = jnp.einsum("rij,rjk,rlk->ril", Ra, inertia_inv[a], Ra) * valid[:, None, None]
        inv_IB = jnp.einsum("rij,rjk,rlk->ril", Rb, inertia_inv[b], Rb) * valid[:, None, None]
        JaA = jnp.cross(rA, n)
        JaB = -jnp.cross(rB, n)
        em = eff_mass_of(n, JaA, -n, JaB, inv_mA * deg[a],
                         inv_IA * deg[a][:, None, None],
                         inv_mB * deg[b], inv_IB * deg[b][:, None, None])
        corr = jnp.where(valid, error * CONTACT_POSITION_CORRECTION_RATE * em, 0.0)

        dpos = jnp.zeros_like(pos)
        dang = jnp.zeros_like(pos)
        dpos = dpos.at[a].add(inv_mA[:, None] * n * corr[:, None])
        dang = dang.at[a].add(jnp.einsum("rij,rj->ri", inv_IA, JaA) * corr[:, None])
        dpos = dpos.at[b].add(inv_mB[:, None] * -n * corr[:, None])
        dang = dang.at[b].add(jnp.einsum("rij,rj->ri", inv_IB, JaB) * corr[:, None])

        pos = pos + dpos
        orn = quat.integrate(orn, dang, 1.0)
        return pos, orn

    pos, orn = jax.lax.fori_loop(0, num_iterations, body, (state.pos, state.orn))
    return dataclasses.replace(state, pos=pos, orn=orn)
