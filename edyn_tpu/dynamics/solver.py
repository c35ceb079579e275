"""Batched impulse solver.

TPU-native replacement for the reference's per-island sequential-impulse
Gauss-Seidel (src/edyn/dynamics/solver.cpp:387-468,
src/edyn/dynamics/island_solver.cpp:94-111; row math SURVEY A.1). The row
semantics are preserved exactly:

- prepare:  eff_mass = 1 / (J0.J0*inv_mA + (inv_IA J1).J1 + J2.J2*inv_mB +
            (inv_IB J3).J3);  rhs = -(error*erp + relvel*(1+restitution))
- solve:    dLambda = (rhs - J.dv) * eff_mass, accumulate + clamp, apply to
            delta velocities; deltas hit the real velocities only at
            integrate_velocities.
- friction: 2 tangent rows solved jointly, 2D impulse clamped to the friction
            circle mu * lambda_normal of the coupled normal row
            (src/edyn/constraints/constraint_row_friction.cpp:11-55).

What changes for TPU: instead of solving rows one at a time per island, every
iteration solves ALL rows against the iteration-start deltas and scatter-adds
the results (block-Jacobi over rows, sequential across iterations and across
the normal->friction->joint sub-phases). For convergence parity with strict
Gauss-Seidel, each body's effective mass contribution is scaled by its
constraint degree (mass splitting, Tonge et al. 2012): eff_mass sees
deg*inv_m, applications use plain inv_m — equivalent to solving against d
split copies of the body and averaging. Stacks converge at similar iteration
counts; islands need no bookkeeping because disjoint islands never share
bodies and therefore solve independently inside the same batched iteration.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import LARGE_SCALAR
from ..math import quat, vec

BIG = 1e18


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class ContactRows:
    """One row block per contact point (flattened [M*4]), normal + 2 coupled
    friction directions (reference: contact_constraint::prepare,
    src/edyn/constraints/contact_constraint.cpp:15-58)."""
    valid: jnp.ndarray    # [R] bool
    a: jnp.ndarray        # [R] int32
    b: jnp.ndarray        # [R]
    n: jnp.ndarray        # [R,3] world normal (B -> A)
    rA: jnp.ndarray       # [R,3] world lever arm on A
    rB: jnp.ndarray       # [R,3]
    inv_mA: jnp.ndarray   # [R]
    inv_mB: jnp.ndarray
    inv_IA: jnp.ndarray   # [R,3,3] world-space inverse inertia
    inv_IB: jnp.ndarray
    eff_mass: jnp.ndarray  # [R] normal row (includes mass-splitting scale)
    rhs: jnp.ndarray       # [R]
    t1: jnp.ndarray        # [R,3] friction tangents
    t2: jnp.ndarray
    eff_mass_t1: jnp.ndarray
    eff_mass_t2: jnp.ndarray
    rhs_t1: jnp.ndarray
    rhs_t2: jnp.ndarray
    friction: jnp.ndarray    # [R] mixed coefficient
    restitution: jnp.ndarray  # [R] mixed coefficient


def degree_counts(N, idx_list, valid_list):
    """Constraint degree per body (for mass splitting), >= 1."""
    deg = jnp.zeros((N,), jnp.float32)
    for idx, valid in zip(idx_list, valid_list):
        deg = deg.at[idx].add(valid.astype(jnp.float32))
    return jnp.maximum(deg, 1.0)


def eff_mass_of(Jl_a, Ja_a, Jl_b, Ja_b, inv_mA, inv_IA, inv_mB, inv_IB):
    """reference: src/edyn/constraints/constraint_row.cpp:6-21."""
    term = (vec.dot(Jl_a, Jl_a) * inv_mA
            + vec.dot(jnp.einsum("...ij,...j->...i", inv_IA, Ja_a), Ja_a)
            + vec.dot(Jl_b, Jl_b) * inv_mB
            + vec.dot(jnp.einsum("...ij,...j->...i", inv_IB, Ja_b), Ja_b))
    return jnp.where(term > 1e-12, 1.0 / jnp.maximum(term, 1e-12), 0.0)


def build_contact_rows(state, man, dt: float, use_restitution_solver: bool,
                       mass_splitting: bool = True) -> ContactRows:
    M, P = man.point_valid.shape
    R = M * P
    flat = lambda x: x.reshape((R,) + x.shape[2:])

    a = flat(jnp.broadcast_to(man.body_a[:, None], (M, P)))
    b = flat(jnp.broadcast_to(man.body_b[:, None], (M, P)))
    valid = flat(man.point_valid & man.valid[:, None])

    # responsive only when both bodies have a material (sensors don't push;
    # reference: collision_util chooses null_constraint when material absent)
    valid &= state.has_material[a] & state.has_material[b]
    # skip rows whose bodies are all asleep (islands woke mixed pairs already)
    valid &= ~(state.asleep[a] & state.asleep[b])

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

    if mass_splitting:
        deg = degree_counts(state.capacity, [a, b], [valid, valid])
        degA = deg[a]
        degB = deg[b]
    else:
        degA = degB = 1.0

    JaA = jnp.cross(rA, n)
    JaB = -jnp.cross(rB, n)
    em = eff_mass_of(n, JaA, -n, JaB, inv_mA * degA, inv_IA * degA[:, None, None],
                     inv_mB * degB, inv_IB * degB[:, None, None])

    relvel = (vec.dot(n, state.linvel[a]) + vec.dot(JaA, state.angvel[a])
              + vec.dot(-n, state.linvel[b]) + vec.dot(JaB, state.angvel[b]))
    dist = flat(man.distance)
    # speculative contact: error = distance/dt when separated (SURVEY A.2)
    error = jnp.where(dist > 0, dist / dt, 0.0)
    erp = 0.2
    restit_mix = jnp.minimum(state.restitution[a], state.restitution[b])
    # with the restitution pre-pass enabled the main rows get zero restitution
    # (reference: solver.cpp:280-283)
    restitution = 0.0 if use_restitution_solver else restit_mix
    rhs = -(error * erp + relvel * (1.0 + restitution))

    # friction tangents from the normal (reference uses plane_space(normal))
    t1, t2 = vec.orthonormal_basis(n)
    Ja_t1A = jnp.cross(rA, t1)
    Ja_t1B = -jnp.cross(rB, t1)
    Ja_t2A = jnp.cross(rA, t2)
    Ja_t2B = -jnp.cross(rB, t2)
    em_t1 = eff_mass_of(t1, Ja_t1A, -t1, Ja_t1B, inv_mA * degA,
                        inv_IA * degA[:, None, None], inv_mB * degB,
                        inv_IB * degB[:, None, None])
    em_t2 = eff_mass_of(t2, Ja_t2A, -t2, Ja_t2B, inv_mA * degA,
                        inv_IA * degA[:, None, None], inv_mB * degB,
                        inv_IB * degB[:, None, None])
    rhs_t1 = -(vec.dot(t1, state.linvel[a]) + vec.dot(Ja_t1A, state.angvel[a])
               + vec.dot(-t1, state.linvel[b]) + vec.dot(Ja_t1B, state.angvel[b]))
    rhs_t2 = -(vec.dot(t2, state.linvel[a]) + vec.dot(Ja_t2A, state.angvel[a])
               + vec.dot(-t2, state.linvel[b]) + vec.dot(Ja_t2B, state.angvel[b]))

    # default material mixing (reference: dynamics/material_mixing.hpp:13-35)
    friction = jnp.sqrt(jnp.maximum(state.friction[a] * state.friction[b], 0.0))

    return ContactRows(
        valid=valid, a=a, b=b, n=n, rA=rA, rB=rB,
        inv_mA=inv_mA, inv_mB=inv_mB, inv_IA=inv_IA, inv_IB=inv_IB,
        eff_mass=em, rhs=rhs,
        t1=t1, t2=t2, eff_mass_t1=em_t1, eff_mass_t2=em_t2,
        rhs_t1=rhs_t1, rhs_t2=rhs_t2,
        friction=friction, restitution=restit_mix,
    )


def refresh_contact_rhs(rows: ContactRows, state, man, dt: float,
                        use_restitution_solver: bool) -> ContactRows:
    """Recompute rhs terms against current velocities (called after the
    restitution pre-pass and gravity, matching the reference's prepare order:
    solver.cpp:387-405)."""
    a, b = rows.a, rows.b
    JaA = jnp.cross(rows.rA, rows.n)
    JaB = -jnp.cross(rows.rB, rows.n)
    relvel = (vec.dot(rows.n, state.linvel[a]) + vec.dot(JaA, state.angvel[a])
              + vec.dot(-rows.n, state.linvel[b]) + vec.dot(JaB, state.angvel[b]))
    M, P = man.point_valid.shape
    dist = man.distance.reshape(M * P)
    error = jnp.where(dist > 0, dist / dt, 0.0)
    restitution = 0.0 if use_restitution_solver else rows.restitution
    rhs = -(error * 0.2 + relvel * (1.0 + restitution))

    def trhs(t, rA, rB):
        JtA = jnp.cross(rA, t)
        JtB = -jnp.cross(rB, t)
        return -(vec.dot(t, state.linvel[a]) + vec.dot(JtA, state.angvel[a])
                 + vec.dot(-t, state.linvel[b]) + vec.dot(JtB, state.angvel[b]))

    return dataclasses.replace(rows, rhs=rhs,
                               rhs_t1=trhs(rows.t1, rows.rA, rows.rB),
                               rhs_t2=trhs(rows.t2, rows.rA, rows.rB))


def apply_impulse(rows, Jl, Ja_a, Ja_b, dlam, dv, dw):
    """Scatter an impulse along row jacobians into delta velocities.
    Jl is the linear direction on A (negated for B)."""
    dlam = jnp.where(rows.valid, dlam, 0.0)
    dv = dv.at[rows.a].add(rows.inv_mA[:, None] * Jl * dlam[:, None])
    dw = dw.at[rows.a].add(
        jnp.einsum("...ij,...j->...i", rows.inv_IA, Ja_a) * dlam[:, None])
    dv = dv.at[rows.b].add(rows.inv_mB[:, None] * (-Jl) * dlam[:, None])
    dw = dw.at[rows.b].add(
        jnp.einsum("...ij,...j->...i", rows.inv_IB, Ja_b) * dlam[:, None])
    return dv, dw


def _row_delta_relvel(rows, Jl, Ja_a, Ja_b, dv, dw):
    return (vec.dot(Jl, dv[rows.a]) + vec.dot(Ja_a, dw[rows.a])
            + vec.dot(-Jl, dv[rows.b]) + vec.dot(Ja_b, dw[rows.b]))


def warm_start_contacts(rows: ContactRows, n_imp, f_imp, dv, dw):
    """Apply stored impulses before iterating (reference:
    constraint_row.cpp warm_start)."""
    JaA = jnp.cross(rows.rA, rows.n)
    JaB = -jnp.cross(rows.rB, rows.n)
    dv, dw = apply_impulse(rows, rows.n, JaA, JaB, n_imp, dv, dw)
    for tdir, imp in ((rows.t1, f_imp[:, 0]), (rows.t2, f_imp[:, 1])):
        Ja_tA = jnp.cross(rows.rA, tdir)
        Ja_tB = -jnp.cross(rows.rB, tdir)
        dv, dw = apply_impulse(rows, tdir, Ja_tA, Ja_tB, imp, dv, dw)
    return dv, dw


def solve_contacts_once(rows: ContactRows, n_imp, f_imp, dv, dw):
    """One velocity iteration over all contact rows: normal sub-phase then
    coupled friction sub-phase."""
    JaA = jnp.cross(rows.rA, rows.n)
    JaB = -jnp.cross(rows.rB, rows.n)
    drel = _row_delta_relvel(rows, rows.n, JaA, JaB, dv, dw)
    dlam = (rows.rhs - drel) * rows.eff_mass
    new_imp = jnp.clip(n_imp + dlam, 0.0, BIG)
    dlam = new_imp - n_imp
    dv, dw = apply_impulse(rows, rows.n, JaA, JaB, dlam, dv, dw)
    n_imp = new_imp

    # friction: solve both tangent rows, clamp 2D to mu * normal impulse
    Ja_t1A = jnp.cross(rows.rA, rows.t1)
    Ja_t1B = -jnp.cross(rows.rB, rows.t1)
    Ja_t2A = jnp.cross(rows.rA, rows.t2)
    Ja_t2B = -jnp.cross(rows.rB, rows.t2)
    d1 = (rows.rhs_t1 - _row_delta_relvel(rows, rows.t1, Ja_t1A, Ja_t1B, dv, dw)) * rows.eff_mass_t1
    d2 = (rows.rhs_t2 - _row_delta_relvel(rows, rows.t2, Ja_t2A, Ja_t2B, dv, dw)) * rows.eff_mass_t2
    imp1 = f_imp[:, 0] + d1
    imp2 = f_imp[:, 1] + d2
    max_len = rows.friction * n_imp
    ln = jnp.sqrt(imp1 * imp1 + imp2 * imp2)
    scale = jnp.where(ln > jnp.maximum(max_len, 1e-12),
                      max_len / jnp.maximum(ln, 1e-12), 1.0)
    imp1 *= scale
    imp2 *= scale
    dv, dw = apply_impulse(rows, rows.t1, Ja_t1A, Ja_t1B, imp1 - f_imp[:, 0], dv, dw)
    dv, dw = apply_impulse(rows, rows.t2, Ja_t2A, Ja_t2B, imp2 - f_imp[:, 1], dv, dw)
    f_imp = jnp.stack([imp1, imp2], axis=-1)
    return n_imp, f_imp, dv, dw


def solve_restitution(state, rows: ContactRows, num_iterations: int,
                      num_individual_iterations: int, dt: float):
    """Restitution shock-propagation pre-pass (reference:
    src/edyn/dynamics/restitution_solver.cpp:86-408; SURVEY A.5).

    The reference walks the contact graph from the fastest-approaching body,
    solving manifolds node by node and applying velocities immediately so the
    shock propagates through chains. Batched reformulation: outer iterations
    play the role of BFS levels — each outer pass solves restitution rows of
    all approaching contacts against the *current* velocities and applies the
    results immediately, so impact waves advance one contact layer per pass.
    Impulses live in separate accumulators and never feed warm starting
    (reference keeps normal_restitution_impulse separate)."""
    linvel, angvel = state.linvel, state.angvel
    relvel_threshold = -0.005  # reference restitution_solver.cpp

    def outer(_, carry):
        linvel, angvel = carry
        JaA = jnp.cross(rows.rA, rows.n)
        JaB = -jnp.cross(rows.rB, rows.n)
        relvel = (vec.dot(rows.n, linvel[rows.a]) + vec.dot(JaA, angvel[rows.a])
                  + vec.dot(-rows.n, linvel[rows.b]) + vec.dot(JaB, angvel[rows.b]))
        active = rows.valid & (relvel < relvel_threshold) & (rows.restitution > 0)
        rhs = -relvel * (1.0 + rows.restitution)

        dv = jnp.zeros_like(linvel)
        dw = jnp.zeros_like(angvel)
        n_imp = jnp.zeros_like(rhs)
        f_imp = jnp.zeros(rhs.shape + (2,))
        sub_rows = dataclasses.replace(rows, valid=active, rhs=rhs,
                                       rhs_t1=jnp.zeros_like(rhs),
                                       rhs_t2=jnp.zeros_like(rhs))

        def inner(_, c):
            n_i, f_i, dv, dw = c
            return solve_contacts_once(sub_rows, n_i, f_i, dv, dw)

        n_imp, f_imp, dv, dw = jax.lax.fori_loop(
            0, num_individual_iterations, inner, (n_imp, f_imp, dv, dw))
        return linvel + dv, angvel + dw

    linvel, angvel = jax.lax.fori_loop(0, num_iterations, outer, (linvel, angvel))
    return linvel, angvel
