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

Dispatch design (the TPU runtime charges per kernel launch, so the hot loop
is built around ONE gather and ONE scatter per iteration):

- body velocity deltas live in a packed [N,6] array (linear 0:3, angular
  3:6); the per-iteration reads of both endpoints of every row are a single
  gather through the precomputed concatenated index vector ``rows.ab`` =
  [a; b], and all six constraint directions' impulses are applied with a
  single scatter-add of a packed [2R,6] update.
- per-body inputs to row building (orientation, velocity, inverse mass and
  world inertia, material columns) are packed once per step into a [N,30]
  "solver view" (pack_solver_view), so preparing R rows costs one [2R,30]
  gather instead of ~30 column gathers.
- per-point manifold inputs are packed [M,4,12] and gathered through the
  compaction map in one go; impulse writeback is one packed [R,6] scatter.
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
    ab: jnp.ndarray       # [2R] = concat(a, b) — single-gather/scatter index
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
    # rolling-row axes AFTER roll-direction alignment (t1/t2 scaled by the
    # projection of each body's designated roll axis; reference:
    # contact_extras_constraint.cpp:44-56)
    roll_t1: jnp.ndarray  # [R,3]
    roll_t2: jnp.ndarray
    # kept for the position solver / diagnostics
    rA: jnp.ndarray
    rB: jnp.ndarray
    # compaction: which flattened manifold point slot (m*4+p) each row came
    # from (for writing impulses back); padding rows point past the end
    row_slot: jnp.ndarray  # [R] int32
    base_dist: jnp.ndarray  # [R] step-start separation (position solver)
    dropped: jnp.ndarray   # [] int32 — live contacts beyond max_rows
    count: jnp.ndarray     # [] int32 — live rows (rows sit in a compacted
                           # prefix of this length; sleep gating slices it)
    # per-tri material scale is folded into friction/restitution already


# ---------------------------------------------------------------------------
# packed gather/scatter helpers (the per-iteration dispatch budget)
# ---------------------------------------------------------------------------

def gather_ab(dvw, ab):
    """One gather of both endpoints' packed [lin, ang] state for every row.
    Returns (lin_a, ang_a, lin_b, ang_b), each [R,3]."""
    g = dvw[ab]
    R = ab.shape[0] // 2
    return g[:R, 0:3], g[:R, 3:6], g[R:, 0:3], g[R:, 3:6]


def scatter_add_ab(dvw, ab, lin_a, ang_a, lin_b, ang_b):
    """One scatter-add applying every row's packed impulse to both bodies."""
    ua = jnp.concatenate([lin_a, ang_a], axis=1)
    ub = jnp.concatenate([lin_b, ang_b], axis=1)
    return dvw.at[ab].add(jnp.concatenate([ua, ub], axis=0))


def pack_solver_view(state):
    """[N,35] per-body inputs for row building — ONE gather per row side.

    Layout: orn 0:4 | linvel 4:7 | angvel 7:10 | inv_m 10 | inv_I world 11:20
    | friction 20 | restitution 21 | spin_f 22 | roll_f 23 | stiffness 24 |
    damping 25 | material_id 26 | has_material 27 | asleep 28 | com 29:32 |
    roll_axis 32:35."""
    N = state.capacity
    Iw = state.inertia_world_inv().reshape(N, 9)
    f = lambda x: x.astype(jnp.float32)[:, None]
    return jnp.concatenate([
        state.orn, state.linvel, state.angvel, f(state.mass_inv), Iw,
        f(state.friction), f(state.restitution), f(state.spin_friction),
        f(state.roll_friction), f(state.stiffness), f(state.damping),
        f(state.material_id), f(state.has_material), f(state.asleep),
        state.com, state.roll_axis,
    ], axis=1)


def pack_manifold_points(man):
    """[M,4,14] per-point narrowphase outputs: pivot_a 0:3 | pivot_b 3:6 |
    local_normal 6:9 | attachment 9 | distance 10 | point_valid 11 |
    friction_scale 12 | restitution_scale 13."""
    f = lambda x: x.astype(jnp.float32)[..., None]
    return jnp.concatenate([
        man.pivot_a, man.pivot_b, man.local_normal,
        f(man.normal_attachment), f(man.distance), f(man.point_valid),
        f(man.friction_scale), f(man.restitution_scale),
    ], axis=-1)


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

    # pair-level eligibility on [M] (body code packs has_material + inactive
    # so both pair sides cost one tiny gather each). A side is inactive when
    # asleep OR static: a sleeping manifold — including an asleep body
    # resting on a static one — builds no rows at all (reference: sleeping
    # islands are excluded from the solver, island_manager.cpp:541-596).
    # Kinematic bodies stay active so their motion keeps solving contacts.
    from ..core.state import KIND_STATIC
    inactive = state.asleep | ((state.kind == KIND_STATIC) & state.valid)
    code = (state.has_material.astype(jnp.int32)
            + inactive.astype(jnp.int32) * 2)
    ca = code[man.body_a]
    cb = code[man.body_b]
    elig = man.valid & ((ca & 1) > 0) & ((cb & 1) > 0) \
        & ~(((ca & 2) > 0) & ((cb & 2) > 0))
    valid0 = (man.point_valid & elig[:, None]).reshape(Rfull)

    R = max_rows or Rfull
    if R < Rfull:
        from ..collision.broadphase import _compact
        row_slot, cnt = _compact(valid0, R)
        slot_ok = row_slot >= 0
        row_slot = jnp.where(slot_ok, row_slot, Rfull - 1).astype(jnp.int32)
        valid = valid0[row_slot] & slot_ok
        rows_dropped = jnp.maximum(cnt - R, 0)
        live_count = jnp.minimum(cnt, R).astype(jnp.int32)
    else:
        row_slot = jnp.arange(Rfull, dtype=jnp.int32)
        valid = valid0
        rows_dropped = jnp.zeros((), jnp.int32)
        # no compaction: live rows are scattered, the prefix slice is invalid
        live_count = jnp.int32(Rfull)

    pair_idx = row_slot // P
    ab_pair = jnp.stack([man.body_a, man.body_b], axis=1)[pair_idx]  # [R,2]
    a = ab_pair[:, 0]
    b = ab_pair[:, 1]
    ab = jnp.concatenate([a, b])

    # one gather for all per-point inputs
    pt = pack_manifold_points(man).reshape(Rfull, 14)[row_slot]
    pa_l = pt[:, 0:3]
    pb_l = pt[:, 3:6]
    ln = pt[:, 6:9]
    attach = pt[:, 9].astype(jnp.int32)
    dist = pt[:, 10]
    fr_scale = pt[:, 12]
    re_scale = pt[:, 13]

    # one gather for all per-body inputs
    g = pack_solver_view(state)[ab]                 # [2R,30]
    ga, gb = g[:R], g[R:]
    orn_a, orn_b = ga[:, 0:4], gb[:, 0:4]
    va, wa = ga[:, 4:7], ga[:, 7:10]
    vb, wb = gb[:, 4:7], gb[:, 7:10]
    inv_mA = jnp.where(valid, ga[:, 10], 0.0)
    inv_mB = jnp.where(valid, gb[:, 10], 0.0)
    inv_IA = ga[:, 11:20].reshape(R, 3, 3) * valid[:, None, None]
    inv_IB = gb[:, 11:20].reshape(R, 3, 3) * valid[:, None, None]

    n = jnp.where((attach == 1)[:, None], quat.rotate(orn_a, ln),
                  jnp.where((attach == 2)[:, None], quat.rotate(orn_b, ln), ln))
    # pivots live in the ORIGIN frame; moment arms are about the COM:
    # world_pivot - pos = R * (pivot_local - com)
    rA = quat.rotate(orn_a, pa_l - ga[:, 29:32])
    rB = quat.rotate(orn_b, pb_l - gb[:, 29:32])

    if mass_splitting:
        v2 = valid.astype(jnp.float32)
        deg = jnp.full((state.capacity,), 1.0).at[ab].add(
            jnp.concatenate([v2, v2]), mode="drop")
        dg = jnp.maximum(deg[ab] - 1.0, 1.0)
        degA, degB = dg[:R], dg[R:]
    else:
        degA = degB = jnp.ones_like(inv_mA)

    t1, t2 = vec.orthonormal_basis(n)

    def dir_rows(d, rhs_fn):
        JaA, JaB, tA, tB, em = _make_dir(d, rA, rB, inv_mA, inv_IA, inv_mB,
                                         inv_IB, degA, degB)
        relvel = (vec.dot(d, va) + vec.dot(JaA, wa)
                  - vec.dot(d, vb) + vec.dot(JaB, wb))
        return RowDir(JaA=JaA, JaB=JaB, tA=tA, tB=tB, eff_mass=em,
                      rhs=rhs_fn(relvel))

    restit_mix = jnp.minimum(ga[:, 21], gb[:, 21])

    # default material mixing (reference: dynamics/material_mixing.hpp:13-35)
    friction = jnp.sqrt(jnp.maximum(ga[:, 20] * gb[:, 20], 0.0))
    spin_fr = jnp.maximum(ga[:, 22], gb[:, 22])
    roll_fr = jnp.maximum(ga[:, 23], gb[:, 23])
    # series stiffness/damping (reference mix: 1/(1/a+1/b))
    stiff = 1.0 / (1.0 / jnp.maximum(ga[:, 24], 1.0)
                   + 1.0 / jnp.maximum(gb[:, 24], 1.0))
    dampc = 1.0 / (1.0 / jnp.maximum(ga[:, 25], 1.0)
                   + 1.0 / jnp.maximum(gb[:, 25], 1.0))

    # pair-table override (reference: material_mix_table lookup precedes the
    # default mix functions, src/edyn/util/collision_util.cpp:294-310)
    mix = state.mix_table
    if mix.ids.shape[0] > 0:
        ida = ga[:, 26].astype(jnp.int32)
        idb = gb[:, 26].astype(jnp.int32)
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
        stiff = jnp.where(has & (v[:, 4] > 0), v[:, 4], stiff)
        dampc = jnp.where(has & (v[:, 5] > 0), v[:, 5], dampc)

    # per-point surface material scale (per-triangle mesh materials,
    # reference Design.md:199-203) applies after body/pair mixing
    friction = friction * fr_scale
    restit_mix = jnp.clip(restit_mix * re_scale, 0.0, 1.0)

    # with the restitution pre-pass enabled the main rows get zero restitution
    # (reference: solver.cpp:280-283); mixing (incl. the pair-table override)
    # happens ABOVE so the rhs sees the overridden value
    restitution = jnp.zeros_like(restit_mix) if use_restitution_solver else restit_mix
    # speculative contact: error = distance/dt when separated (SURVEY A.2)
    error = jnp.where(dist > 0, dist / dt, 0.0)

    rn = dir_rows(n, lambda rv: -(error * 0.2 + rv * (1.0 + restitution)))
    r1 = dir_rows(t1, lambda rv: -rv)
    r2 = dir_rows(t2, lambda rv: -rv)

    if with_spin_roll:
        def ang_row(d):
            sA = jnp.einsum("...ij,...j->...i", inv_IA, d)
            sB = jnp.einsum("...ij,...j->...i", inv_IB, -d)
            term = (vec.dot(sA, d) * degA + vec.dot(sB, -d) * degB)
            em = jnp.where(term > 1e-12, 1.0 / jnp.maximum(term, 1e-12), 0.0)
            return sA, sB, em

        # roll-direction alignment: scale each rolling-row axis by the
        # projection of every designated roll axis onto it, so impulses in
        # undesired directions vanish (reference:
        # contact_extras_constraint.cpp:44-56; roll axes assigned per shape,
        # rigidbody.cpp:119-127). Unlike the reference — which rotates both
        # bodies' roll_dir by bodyA's orientation — each body's axis is
        # rotated by its OWN orientation.
        rdA = ga[:, 32:35]
        rdB = gb[:, 32:35]
        wrA = quat.rotate(orn_a, rdA)
        wrB = quat.rotate(orn_b, rdB)
        hasA = vec.length_sqr(rdA) > 1e-12
        hasB = vec.length_sqr(rdB) > 1e-12

        def roll_aligned(t):
            sc = jnp.where(hasA, vec.dot(wrA, t), 1.0) \
                * jnp.where(hasB, vec.dot(wrB, t), 1.0)
            return t * sc[..., None]

        roll_t1 = roll_aligned(t1)
        roll_t2 = roll_aligned(t2)
        sA_n, sB_n, em_spin = ang_row(n)
        sA_t1, sB_t1, em_roll1 = ang_row(roll_t1)
        sA_t2, sB_t2, em_roll2 = ang_row(roll_t2)
        rel_w = wa - wb
        rhs_spin = -vec.dot(n, rel_w)
        rhs_roll1 = -vec.dot(roll_t1, rel_w)
        rhs_roll2 = -vec.dot(roll_t2, rel_w)
    else:
        # scene has no spin/roll materials (static fact) — skip the work
        sA_n = sB_n = sA_t1 = sB_t1 = sA_t2 = sB_t2 = None
        em_spin = em_roll1 = em_roll2 = None
        rhs_spin = rhs_roll1 = rhs_roll2 = None
        roll_t1 = roll_t2 = None

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

    return ContactRows(valid=valid, a=a, b=b, ab=ab,
                       inv_mA=inv_mA, inv_mB=inv_mB,
                       n=n, t1=t1, t2=t2, rn=rn, r1=r1, r2=r2,
                       friction=friction, restitution=restit_mix,
                       upper_n=upper_n, soft=soft,
                       row_slot=row_slot, base_dist=dist,
                       spin_friction=spin_fr, roll_friction=roll_fr,
                       sA_n=sA_n, sB_n=sB_n, sA_t1=sA_t1, sB_t1=sB_t1,
                       sA_t2=sA_t2, sB_t2=sB_t2,
                       em_spin=em_spin, em_roll1=em_roll1, em_roll2=em_roll2,
                       rhs_spin=rhs_spin, rhs_roll1=rhs_roll1,
                       rhs_roll2=rhs_roll2, roll_t1=roll_t1, roll_t2=roll_t2,
                       rA=rA, rB=rB,
                       dropped=rows_dropped, count=live_count)


def rows_prefix(rows: ContactRows, Rs: int) -> ContactRows:
    """First Rs rows of a compacted row table (valid rows live in a prefix;
    callers must guarantee rows.count <= Rs). Used by the sleep-gating
    lax.cond in the stepper: a mostly-asleep world solves a narrow table."""
    R = rows.valid.shape[0]
    assert Rs <= R

    def cut(x):
        if x is None or getattr(x, "ndim", 0) == 0:
            return x
        return x[:Rs]

    def cut_dir(rd: RowDir) -> RowDir:
        return RowDir(*(cut(getattr(rd, f.name))
                        for f in dataclasses.fields(RowDir)))

    kw = {}
    for f in dataclasses.fields(ContactRows):
        v = getattr(rows, f.name)
        if f.name == "ab":
            kw[f.name] = jnp.concatenate([rows.a[:Rs], rows.b[:Rs]])
        elif isinstance(v, RowDir):
            kw[f.name] = cut_dir(v)
        else:
            kw[f.name] = cut(v)
    return ContactRows(**kw)


def refresh_contact_rhs(rows: ContactRows, state, man, dt: float,
                        use_restitution_solver: bool) -> ContactRows:
    """Recompute rhs terms against current velocities (called after the
    restitution pre-pass and gravity, matching the reference's prepare order:
    solver.cpp:387-405)."""
    velp = jnp.concatenate([state.linvel, state.angvel], axis=1)
    va, wa, vb, wb = gather_ab(velp, rows.ab)
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
                               rhs_roll1=-vec.dot(rows.roll_t1, rel_w),
                               rhs_roll2=-vec.dot(rows.roll_t2, rel_w))


def warm_start_contacts(rows: ContactRows, imp6, dvw):
    """Apply stored impulses before iterating (reference:
    constraint_row.cpp warm_start) — one packed scatter.

    ``imp6`` packs the six accumulated impulses [R,6]:
    normal 0 | friction 1:3 | spin 3 | roll 4:6 (same layout as the manifold
    impulse store, so warm start and writeback are slice-free)."""
    n_imp, f_imp, s_imp, r_imp = (imp6[:, 0], imp6[:, 1:3], imp6[:, 3],
                                  imp6[:, 4:6])
    m = lambda x: jnp.where(rows.valid, x, 0.0)[:, None]
    dn_ = m(n_imp)
    df1_ = m(f_imp[:, 0])
    df2_ = m(f_imp[:, 1])
    lin = rows.n * dn_ + rows.t1 * df1_ + rows.t2 * df2_
    lin_a = rows.inv_mA[:, None] * lin
    lin_b = rows.inv_mB[:, None] * -lin
    ang_a = rows.rn.tA * dn_ + rows.r1.tA * df1_ + rows.r2.tA * df2_
    ang_b = rows.rn.tB * dn_ + rows.r1.tB * df1_ + rows.r2.tB * df2_
    if rows.sA_n is not None:
        ds_ = m(s_imp)
        dr1_ = m(r_imp[:, 0])
        dr2_ = m(r_imp[:, 1])
        ang_a = ang_a + rows.sA_n * ds_ + rows.sA_t1 * dr1_ + rows.sA_t2 * dr2_
        ang_b = ang_b + rows.sB_n * ds_ + rows.sB_t1 * dr1_ + rows.sB_t2 * dr2_
    return scatter_add_ab(dvw, rows.ab, lin_a, ang_a, lin_b, ang_b)


def solve_contacts_once(rows: ContactRows, imp6, dvw):
    """One velocity iteration over all contact rows.

    All six directions of a contact (normal, 2 friction tangents, spin, 2
    rolling) are solved against the iteration-start deltas and applied as ONE
    combined impulse per row — a single packed gather (both bodies' [lin,ang]
    deltas) and a single packed scatter per iteration, which is what the TPU
    wants. The sequencing the reference gets from per-row ordering comes from
    the outer iterations; friction/spin/roll limits couple to the just-updated
    normal impulse exactly like the reference's friction solve
    (constraint_row_friction.cpp:11-55)."""
    n_imp, f_imp, s_imp, r_imp = (imp6[:, 0], imp6[:, 1:3], imp6[:, 3],
                                  imp6[:, 4:6])
    dva, dwa, dvb, dwb = gather_ab(dvw, rows.ab)

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
        dr1 = (rows.rhs_roll1 - (vec.dot(rows.roll_t1, dwa)
                                 - vec.dot(rows.roll_t1, dwb))) * rows.em_roll1
        dr2 = (rows.rhs_roll2 - (vec.dot(rows.roll_t2, dwa)
                                 - vec.dot(rows.roll_t2, dwb))) * rows.em_roll2
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
        r1_out, r2_out = r1n, r2n
    else:
        s_out = s_imp
        r1_out, r2_out = r_imp[:, 0], r_imp[:, 1]

    dvw = scatter_add_ab(dvw, rows.ab, dva_c, dwa_c, dvb_c, dwb_c)
    imp6 = jnp.stack([new_n, imp1, imp2, s_out, r1_out, r2_out], axis=-1)
    return imp6, dvw


def solve_restitution_pallas(state, rows: ContactRows, tbl, ab_p,
                             num_iterations: int,
                             num_individual_iterations: int,
                             interpret: bool = False):
    """solve_restitution with the inner-iteration math as ONE Pallas kernel
    per iteration (see dynamics/pallas_solver.py). Semantics identical to
    solve_restitution (tested in tests/test_pallas_solver.py); the outer
    while keeps the reference's early exit. ``tbl``/``ab_p`` come from
    pallas_solver.pack_rows_t on the same rows."""
    from . import pallas_solver as ps

    relvel_threshold = -0.005
    N = state.capacity
    Rp = tbl.shape[1]
    valid_p = tbl[55:56, :] > 0.5
    restit_p = tbl[56:57, :]

    def relvel_of(velp_t):
        return ps.relvel_pallas(tbl, velp_t[:, ab_p], interpret=interpret)

    def cond(carry):
        it, velp_t, go = carry
        return (it < num_iterations) & go

    def body(carry):
        it, velp_t, _ = carry
        relvel = relvel_of(velp_t)
        active = valid_p & (relvel < relvel_threshold) & (restit_p > 0)
        go = jnp.any(active)
        rhs = -relvel * (1.0 + restit_p)
        dyn = jnp.concatenate([rhs, active.astype(jnp.float32)], axis=0)

        dvw_t = jnp.zeros((6, N))
        imp3_t = jnp.zeros((3, Rp))
        for _ in range(num_individual_iterations):
            g = dvw_t[:, ab_p]
            imp3_t, upd = ps.restitution_iteration_pallas(
                tbl, dyn, imp3_t, g, interpret=interpret)
            dvw_t = dvw_t.at[:, ab_p].add(
                jnp.concatenate([upd[:6], upd[6:]], axis=1))
        return it + 1, velp_t + dvw_t, go

    velp0 = jnp.concatenate([state.linvel, state.angvel], axis=1).T
    relvel0 = relvel_of(velp0)
    go0 = jnp.any(valid_p & (relvel0 < relvel_threshold) & (restit_p > 0))
    _, velp_t, _ = jax.lax.while_loop(cond, body,
                                      (jnp.int32(0), velp0, go0))
    velp = velp_t.T
    return velp[:, 0:3], velp[:, 3:6]


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

    def relvels(velp):
        va, wa, vb, wb = gather_ab(velp, rows.ab)
        return (vec.dot(rows.n, va) + vec.dot(rows.rn.JaA, wa)
                - vec.dot(rows.n, vb) + vec.dot(rows.rn.JaB, wb))

    def cond(carry):
        # the approach test is computed inside body and CARRIED — the
        # while predicate itself costs one scalar read per trip instead of
        # re-running the gather+relvel chain (launch-overhead discipline)
        it, velp, go = carry
        return (it < num_iterations) & go

    def body(carry):
        it, velp, _ = carry
        relvel = relvels(velp)
        active = rows.valid & (relvel < relvel_threshold) & (rows.restitution > 0)
        go = jnp.any(active)
        rhs = -relvel * (1.0 + rows.restitution)

        dvw = jnp.zeros_like(velp)
        imp3 = jnp.zeros(rhs.shape + (3,))   # normal 0 | friction 1:3

        def inner(_, c):
            imp3, dvw = c
            n_i, f_i = imp3[:, 0], imp3[:, 1:3]
            dva, dwa, dvb, dwb = gather_ab(dvw, rows.ab)

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
            lin_a = rows.inv_mA[:, None] * lin
            lin_b = rows.inv_mB[:, None] * -lin
            ang_a = rows.rn.tA * dn_ + rows.r1.tA * df1_ + rows.r2.tA * df2_
            ang_b = rows.rn.tB * dn_ + rows.r1.tB * df1_ + rows.r2.tB * df2_
            dvw = scatter_add_ab(dvw, rows.ab, lin_a, ang_a, lin_b, ang_b)
            return jnp.stack([new_n, imp1, imp2], -1), dvw

        imp3, dvw = jax.lax.fori_loop(
            0, num_individual_iterations, inner, (imp3, dvw))
        return it + 1, velp + dvw, go

    velp0 = jnp.concatenate([state.linvel, state.angvel], axis=1)
    relvel0 = relvels(velp0)
    go0 = jnp.any(rows.valid & (relvel0 < relvel_threshold)
                  & (rows.restitution > 0))
    _, velp, _ = jax.lax.while_loop(cond, body,
                                    (jnp.int32(0), velp0, go0))
    return velp[:, 0:3], velp[:, 3:6]
