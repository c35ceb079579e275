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
split copies of the body and averaging. Islands need no bookkeeping because
disjoint islands never share bodies and solve independently inside the same
batched iteration.

Bandwidth design: the per-row Jacobians and their inertia-applied
counterparts (t = I^-1 (r x d)) are precomputed once per step, so each solver
iteration touches only [R,3] vectors — no 3x3 matrix reads in the hot loop
(the reference does the same: constraint_row stores J and inv_I once,
constraint_row.hpp:20-52).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..math import quat, vec

BIG = 1e18


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class RowDir:
    """One constraint direction of a contact point: linear dir d (on A;
    negated on B), angular jacobians Ja = r x d, and the inertia-applied
    angular response t = I^-1 Ja."""
    JaA: jnp.ndarray  # [R,3]
    JaB: jnp.ndarray  # [R,3]
    tA: jnp.ndarray   # [R,3] inv_IA @ JaA
    tB: jnp.ndarray   # [R,3] inv_IB @ JaB
    eff_mass: jnp.ndarray  # [R]
    rhs: jnp.ndarray       # [R]


@_dc
class ContactRows:
    """One row block per contact point (flattened [M*4]), normal + 2 coupled
    friction directions (reference: contact_constraint::prepare,
    src/edyn/constraints/contact_constraint.cpp:15-58)."""
    valid: jnp.ndarray    # [R] bool
    a: jnp.ndarray        # [R] int32
    b: jnp.ndarray        # [R]
    inv_mA: jnp.ndarray   # [R]
    inv_mB: jnp.ndarray
    n: jnp.ndarray        # [R,3] world normal (B -> A)
    t1: jnp.ndarray       # [R,3] friction tangents
    t2: jnp.ndarray
    rn: RowDir
    r1: RowDir
    r2: RowDir
    friction: jnp.ndarray     # [R] mixed coefficient
    restitution: jnp.ndarray  # [R] mixed coefficient
    upper_n: jnp.ndarray      # [R] normal-impulse cap: BIG for rigid contacts,
                              # spring+damper impulse for soft ones (reference:
                              # contact_extras_constraint stiffness/damping
                              # rows, src/edyn/util/collision_util.cpp:372-379)
    soft: jnp.ndarray         # [R] bool — excluded from NGS position solve
    # spin & rolling friction (reference: contact_extras_constraint,
    # src/edyn/constraints/contact_extras_constraint.cpp — pure angular rows
    # whose impulse is limited by the normal load): mixed coefficients and
    # precomputed angular response vectors per axis (n, t1, t2)
    spin_friction: jnp.ndarray  # [R]
    roll_friction: jnp.ndarray  # [R]
    sA_n: jnp.ndarray   # [R,3] inv_IA @ n ... angular-only application vecs
    sB_n: jnp.ndarray
    sA_t1: jnp.ndarray
    sB_t1: jnp.ndarray
    sA_t2: jnp.ndarray
    sB_t2: jnp.ndarray
    em_spin: jnp.ndarray   # [R] eff mass of angular row about n
    em_roll1: jnp.ndarray  # about t1
    em_roll2: jnp.ndarray  # about t2
    rhs_spin: jnp.ndarray
    rhs_roll1: jnp.ndarray
    rhs_roll2: jnp.ndarray
    # kept for the position solver / diagnostics
    rA: jnp.ndarray
    rB: jnp.ndarray
    # compaction: which flattened manifold point slot (m*4+p) each row came
    # from (for writing impulses back); padding rows point past the end
    row_slot: jnp.ndarray  # [R] int32
    base_dist: jnp.ndarray  # [R] step-start separation (position solver)


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


def _make_dir(d, rA, rB, inv_mA, inv_IA, inv_mB, inv_IB, degA, degB):
    JaA = vec.cross(rA, d)
    JaB = -vec.cross(rB, d)
    tA = jnp.einsum("...ij,...j->...i", inv_IA, JaA)
    tB = jnp.einsum("...ij,...j->...i", inv_IB, JaB)
    # mass splitting scales only the eff-mass denominator
    term = (vec.dot(d, d) * inv_mA * degA + vec.dot(tA, JaA) * degA
            + vec.dot(d, d) * inv_mB * degB + vec.dot(tB, JaB) * degB)
    em = jnp.where(term > 1e-12, 1.0 / jnp.maximum(term, 1e-12), 0.0)
    return JaA, JaB, tA, tB, em


def build_contact_rows(state, man, dt: float, use_restitution_solver: bool,
                       mass_splitting: bool = True,
                       with_spin_roll: bool = True,
                       max_rows: int | None = None) -> ContactRows:
    """Rows are COMPACTED to the actual touching points (the manifold table is
    padded [M,4]; real contacts are usually a small fraction), so every solver
    phase scales with live contacts instead of capacity. ``row_slot`` maps
    each row back to its manifold point for impulse writeback."""
    M, P = man.point_valid.shape
    Rfull = M * P
    flat0 = lambda x: x.reshape((Rfull,) + x.shape[2:])

    a0 = flat0(jnp.broadcast_to(man.body_a[:, None], (M, P)))
    b0 = flat0(jnp.broadcast_to(man.body_b[:, None], (M, P)))
    valid0 = flat0(man.point_valid & man.valid[:, None])
    # responsive only when both bodies have a material (sensors don't push;
    # reference: collision_util chooses null_constraint when material absent)
    valid0 &= state.has_material[a0] & state.has_material[b0]
    # skip rows whose bodies are all asleep (islands woke mixed pairs already)
    valid0 &= ~(state.asleep[a0] & state.asleep[b0])

    R = max_rows or Rfull
    if R < Rfull:
        from ..collision.broadphase import _compact
        row_slot, _cnt = _compact(valid0, R)
        slot_ok = row_slot >= 0
        row_slot = jnp.where(slot_ok, row_slot, Rfull - 1).astype(jnp.int32)
        flat = lambda x: flat0(x)[row_slot]
        valid = valid0[row_slot] & slot_ok
        a = a0[row_slot]
        b = b0[row_slot]
    else:
        row_slot = jnp.arange(Rfull, dtype=jnp.int32)
        flat = flat0
        valid = valid0
        a = a0
        b = b0

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
        degA = degB = jnp.ones_like(inv_mA)

    t1, t2 = vec.orthonormal_basis(n)

    va, wa = state.linvel[a], state.angvel[a]
    vb, wb = state.linvel[b], state.angvel[b]

    def dir_rows(d, rhs_fn):
        JaA, JaB, tA, tB, em = _make_dir(d, rA, rB, inv_mA, inv_IA, inv_mB,
                                         inv_IB, degA, degB)
        relvel = (vec.dot(d, va) + vec.dot(JaA, wa)
                  - vec.dot(d, vb) + vec.dot(JaB, wb))
        return RowDir(JaA=JaA, JaB=JaB, tA=tA, tB=tB, eff_mass=em,
                      rhs=rhs_fn(relvel))

    dist = flat(man.distance)
    restit_mix = jnp.minimum(state.restitution[a], state.restitution[b])
    # with the restitution pre-pass enabled the main rows get zero restitution
    # (reference: solver.cpp:280-283)
    restitution = jnp.zeros_like(restit_mix) if use_restitution_solver else restit_mix
    # speculative contact: error = distance/dt when separated (SURVEY A.2)
    error = jnp.where(dist > 0, dist / dt, 0.0)

    rn = dir_rows(n, lambda rv: -(error * 0.2 + rv * (1.0 + restitution)))
    r1 = dir_rows(t1, lambda rv: -rv)
    r2 = dir_rows(t2, lambda rv: -rv)

    # default material mixing (reference: dynamics/material_mixing.hpp:13-35)
    friction = jnp.sqrt(jnp.maximum(state.friction[a] * state.friction[b], 0.0))
    spin_fr = jnp.maximum(state.spin_friction[a], state.spin_friction[b])
    roll_fr = jnp.maximum(state.roll_friction[a], state.roll_friction[b])
    # series stiffness/damping (reference mix: 1/(1/a+1/b))
    stiff = 1.0 / (1.0 / jnp.maximum(state.stiffness[a], 1.0)
                   + 1.0 / jnp.maximum(state.stiffness[b], 1.0))
    dampc = 1.0 / (1.0 / jnp.maximum(state.damping[a], 1.0)
                   + 1.0 / jnp.maximum(state.damping[b], 1.0))

    # pair-table override (reference: material_mix_table lookup precedes the
    # default mix functions, src/edyn/util/collision_util.cpp:294-310)
    mix = state.mix_table
    if mix.ids.shape[0] > 0:
        ida = state.material_id[a]
        idb = state.material_id[b]
        lo = jnp.minimum(ida, idb)[:, None]
        hi = jnp.maximum(ida, idb)[:, None]
        tlo = jnp.minimum(mix.ids[:, 0], mix.ids[:, 1])[None, :]
        thi = jnp.maximum(mix.ids[:, 0], mix.ids[:, 1])[None, :]
        match = (lo == tlo) & (hi == thi) & (lo >= 0)           # [R,P]
        has = jnp.any(match, axis=1)
        entry = jnp.argmax(match, axis=1)
        v = mix.vals[entry]
        restit_mix = jnp.where(has, v[:, 0], restit_mix)
        friction = jnp.where(has, v[:, 1], friction)
        spin_fr = jnp.where(has, v[:, 2], spin_fr)
        roll_fr = jnp.where(has, v[:, 3], roll_fr)

    if with_spin_roll:
        def ang_row(d):
            sA = jnp.einsum("...ij,...j->...i", inv_IA, d)
            sB = jnp.einsum("...ij,...j->...i", inv_IB, -d)
            term = (vec.dot(sA, d) * degA + vec.dot(sB, -d) * degB)
            em = jnp.where(term > 1e-12, 1.0 / jnp.maximum(term, 1e-12), 0.0)
            return sA, sB, em

        sA_n, sB_n, em_spin = ang_row(n)
        sA_t1, sB_t1, em_roll1 = ang_row(t1)
        sA_t2, sB_t2, em_roll2 = ang_row(t2)
        rel_w = wa - wb
        rhs_spin = -vec.dot(n, rel_w)
        rhs_roll1 = -vec.dot(t1, rel_w)
        rhs_roll2 = -vec.dot(t2, rel_w)
    else:
        # scene has no spin/roll materials (static fact) — skip the work
        sA_n = sB_n = sA_t1 = sB_t1 = sA_t2 = sB_t2 = None
        em_spin = em_roll1 = em_roll2 = None
        rhs_spin = rhs_roll1 = rhs_roll2 = None

    # soft contacts: normal impulse capped by the spring+damper force over dt
    # (penetration-proportional), instead of the rigid non-penetration row
    from ..config import LARGE_SCALAR
    soft = stiff < LARGE_SCALAR
    pen = jnp.maximum(-dist, 0.0)
    relvel_n = (vec.dot(n, va) + vec.dot(rn.JaA, wa)
                - vec.dot(n, vb) + vec.dot(rn.JaB, wb))
    spring_cap = jnp.maximum((stiff * pen + dampc * jnp.maximum(-relvel_n, 0.0))
                             * dt, 0.0)
    upper_n = jnp.where(soft, spring_cap, BIG)

    return ContactRows(valid=valid, a=a, b=b, inv_mA=inv_mA, inv_mB=inv_mB,
                       n=n, t1=t1, t2=t2, rn=rn, r1=r1, r2=r2,
                       friction=friction, restitution=restit_mix,
                       upper_n=upper_n, soft=soft,
                       row_slot=row_slot, base_dist=dist,
                       spin_friction=spin_fr, roll_friction=roll_fr,
                       sA_n=sA_n, sB_n=sB_n, sA_t1=sA_t1, sB_t1=sB_t1,
                       sA_t2=sA_t2, sB_t2=sB_t2,
                       em_spin=em_spin, em_roll1=em_roll1, em_roll2=em_roll2,
                       rhs_spin=rhs_spin, rhs_roll1=rhs_roll1,
                       rhs_roll2=rhs_roll2, rA=rA, rB=rB)


def refresh_contact_rhs(rows: ContactRows, state, man, dt: float,
                        use_restitution_solver: bool) -> ContactRows:
    """Recompute rhs terms against current velocities (called after the
    restitution pre-pass and gravity, matching the reference's prepare order:
    solver.cpp:387-405)."""
    a, b = rows.a, rows.b
    va, wa = state.linvel[a], state.angvel[a]
    vb, wb = state.linvel[b], state.angvel[b]
    dist = rows.base_dist
    error = jnp.where(dist > 0, dist / dt, 0.0)
    restitution = 0.0 if use_restitution_solver else rows.restitution

    def rv(d, rd):
        return (vec.dot(d, va) + vec.dot(rd.JaA, wa)
                - vec.dot(d, vb) + vec.dot(rd.JaB, wb))

    rn = dataclasses.replace(rows.rn, rhs=-(error * 0.2 + rv(rows.n, rows.rn)
                                            * (1.0 + restitution)))
    r1 = dataclasses.replace(rows.r1, rhs=-rv(rows.t1, rows.r1))
    r2 = dataclasses.replace(rows.r2, rhs=-rv(rows.t2, rows.r2))
    if rows.sA_n is None:
        return dataclasses.replace(rows, rn=rn, r1=r1, r2=r2)
    rel_w = wa - wb
    return dataclasses.replace(rows, rn=rn, r1=r1, r2=r2,
                               rhs_spin=-vec.dot(rows.n, rel_w),
                               rhs_roll1=-vec.dot(rows.t1, rel_w),
                               rhs_roll2=-vec.dot(rows.t2, rel_w))


def _apply(rows: ContactRows, d, rd: RowDir, dlam, dv, dw):
    dlam = jnp.where(rows.valid, dlam, 0.0)
    dv = dv.at[rows.a].add(rows.inv_mA[:, None] * d * dlam[:, None])
    dw = dw.at[rows.a].add(rd.tA * dlam[:, None])
    dv = dv.at[rows.b].add(rows.inv_mB[:, None] * -d * dlam[:, None])
    dw = dw.at[rows.b].add(rd.tB * dlam[:, None])
    return dv, dw


def _delta_relvel(rows: ContactRows, d, rd: RowDir, dv, dw):
    return (vec.dot(d, dv[rows.a]) + vec.dot(rd.JaA, dw[rows.a])
            - vec.dot(d, dv[rows.b]) + vec.dot(rd.JaB, dw[rows.b]))


def _apply_ang(rows: ContactRows, sA, sB, dlam, dw):
    dlam = jnp.where(rows.valid, dlam, 0.0)
    dw = dw.at[rows.a].add(sA * dlam[:, None])
    dw = dw.at[rows.b].add(sB * dlam[:, None])
    return dw


def warm_start_contacts(rows: ContactRows, n_imp, f_imp, s_imp, r_imp, dv, dw):
    """Apply stored impulses before iterating (reference:
    constraint_row.cpp warm_start)."""
    dv, dw = _apply(rows, rows.n, rows.rn, n_imp, dv, dw)
    dv, dw = _apply(rows, rows.t1, rows.r1, f_imp[:, 0], dv, dw)
    dv, dw = _apply(rows, rows.t2, rows.r2, f_imp[:, 1], dv, dw)
    if rows.sA_n is not None:
        dw = _apply_ang(rows, rows.sA_n, rows.sB_n, s_imp, dw)
        dw = _apply_ang(rows, rows.sA_t1, rows.sB_t1, r_imp[:, 0], dw)
        dw = _apply_ang(rows, rows.sA_t2, rows.sB_t2, r_imp[:, 1], dw)
    return dv, dw


def solve_contacts_once(rows: ContactRows, n_imp, f_imp, s_imp, r_imp, dv, dw):
    """One velocity iteration over all contact rows.

    All six directions of a contact (normal, 2 friction tangents, spin, 2
    rolling) are solved against the iteration-start deltas and applied as ONE
    combined impulse per row — a single gather round (dv/dw of both bodies)
    and a single scatter round per iteration, which is what the TPU wants.
    The sequencing the reference gets from per-row ordering comes from the
    outer iterations; friction/spin/roll limits couple to the just-updated
    normal impulse exactly like the reference's friction solve
    (constraint_row_friction.cpp:11-55)."""
    dva = dv[rows.a]
    dwa = dw[rows.a]
    dvb = dv[rows.b]
    dwb = dw[rows.b]

    def drel(d, rd):
        return (vec.dot(d, dva) + vec.dot(rd.JaA, dwa)
                - vec.dot(d, dvb) + vec.dot(rd.JaB, dwb))

    # normal
    dlam = (rows.rn.rhs - drel(rows.n, rows.rn)) * rows.rn.eff_mass
    new_n = jnp.clip(n_imp + dlam, 0.0, rows.upper_n)
    dn = new_n - n_imp

    # friction circle against the updated normal impulse
    d1 = (rows.r1.rhs - drel(rows.t1, rows.r1)) * rows.r1.eff_mass
    d2 = (rows.r2.rhs - drel(rows.t2, rows.r2)) * rows.r2.eff_mass
    imp1 = f_imp[:, 0] + d1
    imp2 = f_imp[:, 1] + d2
    max_len = rows.friction * new_n
    ln = jnp.sqrt(imp1 * imp1 + imp2 * imp2)
    scale = jnp.where(ln > jnp.maximum(max_len, 1e-12),
                      max_len / jnp.maximum(ln, 1e-12), 1.0)
    imp1 *= scale
    imp2 *= scale
    df1 = imp1 - f_imp[:, 0]
    df2 = imp2 - f_imp[:, 1]

    ok = rows.valid
    m = lambda x: jnp.where(ok, x, 0.0)[:, None]
    dn_ = m(dn)
    df1_ = m(df1)
    df2_ = m(df2)

    lin = rows.n * dn_ + rows.t1 * df1_ + rows.t2 * df2_
    dva_c = rows.inv_mA[:, None] * lin
    dvb_c = rows.inv_mB[:, None] * -lin
    dwa_c = rows.rn.tA * dn_ + rows.r1.tA * df1_ + rows.r2.tA * df2_
    dwb_c = rows.rn.tB * dn_ + rows.r1.tB * df1_ + rows.r2.tB * df2_

    if rows.sA_n is not None:
        # spin friction: angular row about n, |impulse| <= mu_spin * lam_n
        rel_s = vec.dot(rows.n, dwa) - vec.dot(rows.n, dwb)
        max_s = rows.spin_friction * new_n
        new_s = jnp.clip(s_imp + (rows.rhs_spin - rel_s) * rows.em_spin,
                         -max_s, max_s)
        ds = new_s - s_imp

        # rolling friction: 2 angular rows about the tangents, joint 2D clamp
        max_r = rows.roll_friction * new_n
        dr1 = (rows.rhs_roll1 - (vec.dot(rows.t1, dwa)
                                 - vec.dot(rows.t1, dwb))) * rows.em_roll1
        dr2 = (rows.rhs_roll2 - (vec.dot(rows.t2, dwa)
                                 - vec.dot(rows.t2, dwb))) * rows.em_roll2
        r1n = r_imp[:, 0] + dr1
        r2n = r_imp[:, 1] + dr2
        lr = jnp.sqrt(r1n * r1n + r2n * r2n)
        sc = jnp.where(lr > jnp.maximum(max_r, 1e-12),
                       max_r / jnp.maximum(lr, 1e-12), 1.0)
        r1n *= sc
        r2n *= sc
        ds_ = m(ds)
        dr1_ = m(r1n - r_imp[:, 0])
        dr2_ = m(r2n - r_imp[:, 1])
        dwa_c = dwa_c + rows.sA_n * ds_ + rows.sA_t1 * dr1_ + rows.sA_t2 * dr2_
        dwb_c = dwb_c + rows.sB_n * ds_ + rows.sB_t1 * dr1_ + rows.sB_t2 * dr2_
        s_out = new_s
        r_out = jnp.stack([r1n, r2n], axis=-1)
    else:
        s_out = s_imp
        r_out = r_imp

    dv = dv.at[rows.a].add(dva_c).at[rows.b].add(dvb_c)
    dw = dw.at[rows.a].add(dwa_c).at[rows.b].add(dwb_c)
    f_imp = jnp.stack([imp1, imp2], axis=-1)
    return new_n, f_imp, s_out, r_out, dv, dw


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
    Like the reference, the pass EARLY-EXITS (lax.while_loop) once no contact
    approaches faster than the threshold — settled scenes pay for one cheap
    check only. Only normal + friction rows are solved (matching the
    reference's restitution pass); impulses never feed warm starting."""
    relvel_threshold = -0.005  # reference restitution_solver.cpp

    def relvels(linvel, angvel):
        return (vec.dot(rows.n, linvel[rows.a]) + vec.dot(rows.rn.JaA, angvel[rows.a])
                - vec.dot(rows.n, linvel[rows.b]) + vec.dot(rows.rn.JaB, angvel[rows.b]))

    def cond(carry):
        it, linvel, angvel = carry
        relvel = relvels(linvel, angvel)
        active = rows.valid & (rows.restitution > 0)
        any_approaching = jnp.any(active & (relvel < relvel_threshold))
        return (it < num_iterations) & any_approaching

    def body(carry):
        it, linvel, angvel = carry
        relvel = relvels(linvel, angvel)
        active = rows.valid & (relvel < relvel_threshold) & (rows.restitution > 0)
        rhs = -relvel * (1.0 + rows.restitution)

        dv = jnp.zeros_like(linvel)
        dw = jnp.zeros_like(angvel)
        n_imp = jnp.zeros_like(rhs)
        f_imp = jnp.zeros(rhs.shape + (2,))

        def inner(_, c):
            n_i, f_i, dv, dw = c
            dva = dv[rows.a]
            dwa = dw[rows.a]
            dvb = dv[rows.b]
            dwb = dw[rows.b]

            def drel(d, rd):
                return (vec.dot(d, dva) + vec.dot(rd.JaA, dwa)
                        - vec.dot(d, dvb) + vec.dot(rd.JaB, dwb))

            dlam = (rhs - drel(rows.n, rows.rn)) * rows.rn.eff_mass
            new_n = jnp.clip(n_i + dlam, 0.0, BIG)
            dn = new_n - n_i
            d1 = -drel(rows.t1, rows.r1) * rows.r1.eff_mass
            d2 = -drel(rows.t2, rows.r2) * rows.r2.eff_mass
            imp1 = f_i[:, 0] + d1
            imp2 = f_i[:, 1] + d2
            max_len = rows.friction * new_n
            ln = jnp.sqrt(imp1 * imp1 + imp2 * imp2)
            sc = jnp.where(ln > jnp.maximum(max_len, 1e-12),
                           max_len / jnp.maximum(ln, 1e-12), 1.0)
            imp1 *= sc
            imp2 *= sc
            mm = lambda x: jnp.where(active, x, 0.0)[:, None]
            dn_ = mm(dn)
            df1_ = mm(imp1 - f_i[:, 0])
            df2_ = mm(imp2 - f_i[:, 1])
            lin = rows.n * dn_ + rows.t1 * df1_ + rows.t2 * df2_
            dv = dv.at[rows.a].add(rows.inv_mA[:, None] * lin)
            dv = dv.at[rows.b].add(rows.inv_mB[:, None] * -lin)
            dw = dw.at[rows.a].add(rows.rn.tA * dn_ + rows.r1.tA * df1_
                                   + rows.r2.tA * df2_)
            dw = dw.at[rows.b].add(rows.rn.tB * dn_ + rows.r1.tB * df1_
                                   + rows.r2.tB * df2_)
            return new_n, jnp.stack([imp1, imp2], -1), dv, dw

        n_imp, f_imp, dv, dw = jax.lax.fori_loop(
            0, num_individual_iterations, inner, (n_imp, f_imp, dv, dw))
        return it + 1, linvel + dv, angvel + dw

    _, linvel, angvel = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state.linvel, state.angvel))
    return linvel, angvel
