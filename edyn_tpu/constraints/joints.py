"""Non-contact constraints (joints) as batched solver rows.

Covers the reference's constraint family (include/edyn/constraints/
constraint.hpp:23-34): distance, soft_distance, point, hinge, cone, generic
(6-DOF), cvjoint, gravity and null. Each joint type contributes rows into a
single padded row table [J, MAX_JOINT_ROWS]; all types are evaluated masked
(joints are few relative to contacts, so masked evaluation beats bucketing).

Row semantics match SURVEY A.1: rhs = -(error * erp + relvel), impulses
accumulated and clamped to [lower, upper], applied to delta velocities. The
position-error terms use error/dt with erp = 0.2 like the reference's
constraint_row_options.
"""
from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp

from ..core.state import JointTable, MAX_JOINT_ROWS
from ..math import quat, vec
from ..dynamics.solver import BIG, degree_counts

# Default positional-error reduction (reference:
# constraint_row_options.hpp:15, erp = 0.2). Per-row overrides are applied
# inline where the reference applies them: the generic constraint's enabled
# linear-limit rows use erp = 0.9 (generic_constraint.cpp:60, see the
# nz_lim select below), and limit rows carry their own restitution in the
# rhs — hinge limits (hinge_constraint.cpp:112-113), cvjoint twist limits,
# generic DOF limits — via rhs = -(error*erp + relvel*(1+restitution)),
# matching constraint_row.cpp:21 exactly.
ERP = 0.2


class JointType(enum.IntEnum):
    NONE = 0
    DISTANCE = 1       # reference: constraints/distance_constraint.hpp
    SOFT_DISTANCE = 2  # reference: constraints/soft_distance_constraint.hpp
    POINT = 3          # reference: constraints/point_constraint.hpp
    HINGE = 4          # reference: constraints/hinge_constraint.hpp:22-115
    CONE = 5           # reference: constraints/cone_constraint.hpp
    GENERIC = 6        # reference: constraints/generic_constraint.hpp
    CVJOINT = 7        # reference: constraints/cvjoint_constraint.hpp
    GRAVITY = 8        # reference: constraints/gravity_constraint.hpp
    NULL = 9           # reference: constraints/null_constraint.hpp:14


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


# Sequential solve groups (by row slot): {0,1,2} linear lock rows,
# {3,4} transverse angular rows, {5+} axial rows (limits, friction, bump
# stops, springs). Groups solve one after another within each velocity
# iteration — rows in DIFFERENT groups couple strongly (a linear row's
# lever arm turns about the same axis a limit row controls), so parallel
# block-Jacobi across them either under-relaxes (row-count mass splitting:
# a hinge converged ~6x slower, leaving warm-started limit impulses to pump
# energy across steps) or overshoots (no splitting). Within a group, one
# joint's rows are mutually orthogonal (or impulse-bounded), so the group
# solves in parallel with per-JOINT degree splitting — near-sequential-GS
# convergence at 3 gather/scatter rounds per iteration over the (small)
# joint table.
N_GROUPS = 3


def _slot_group(slot: int) -> int:
    return 0 if slot < 3 else (1 if slot < 5 else 2)


@_dc
class JointRows:
    """Flattened [J*MAX_JOINT_ROWS] generic rows."""
    valid: jnp.ndarray
    a: jnp.ndarray
    b: jnp.ndarray
    ab: jnp.ndarray    # [2R] concat(a, b) — single gather/scatter index
    JlA: jnp.ndarray   # [R,3]
    JaA: jnp.ndarray
    JlB: jnp.ndarray
    JaB: jnp.ndarray
    inv_mA: jnp.ndarray
    inv_mB: jnp.ndarray
    tA: jnp.ndarray    # [R,3] inv_IA @ JaA (precomputed application vector)
    tB: jnp.ndarray    # [R,3] inv_IB @ JaB
    eff_mass: jnp.ndarray
    rhs: jnp.ndarray
    lower: jnp.ndarray
    upper: jnp.ndarray
    group: jnp.ndarray  # [R] int32 sequential solve group (see N_GROUPS)


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------

def pack_joints(joint_dicts: list, J: int) -> JointTable:
    """Build the device JointTable from builder dicts (see
    edyn_tpu.constraints.api factory functions)."""
    import numpy as np
    t = JointTable.zeros(J)
    jtype = np.zeros((J,), np.int32)
    body_a = np.zeros((J,), np.int32)
    body_b = np.zeros((J,), np.int32)
    valid = np.zeros((J,), bool)
    pivot_a = np.zeros((J, 3), np.float32)
    pivot_b = np.zeros((J, 3), np.float32)
    frame_a = np.zeros((J, 4), np.float32); frame_a[:, 3] = 1
    frame_b = np.zeros((J, 4), np.float32); frame_b[:, 3] = 1
    params = np.zeros((J, 60), np.float32)
    for i, jd in enumerate(joint_dicts):
        jtype[i] = jd["jtype"]
        body_a[i] = jd["body_a"]
        body_b[i] = jd["body_b"]
        valid[i] = True
        pivot_a[i] = jd.get("pivot_a", (0, 0, 0))
        pivot_b[i] = jd.get("pivot_b", (0, 0, 0))
        frame_a[i] = jd.get("frame_a", (0, 0, 0, 1))
        frame_b[i] = jd.get("frame_b", (0, 0, 0, 1))
        p = jd.get("params", ())
        params[i, :len(p)] = p
    return dataclasses.replace(
        t, jtype=jnp.asarray(jtype), body_a=jnp.asarray(body_a),
        body_b=jnp.asarray(body_b), valid=jnp.asarray(valid),
        pivot_a=jnp.asarray(pivot_a), pivot_b=jnp.asarray(pivot_b),
        frame_a=jnp.asarray(frame_a), frame_b=jnp.asarray(frame_b),
        params=jnp.asarray(params))


# ---------------------------------------------------------------------------
# row building
# ---------------------------------------------------------------------------

def build_joint_rows(state, dt: float, mass_splitting: bool = True) -> JointRows:
    jt = state.joints
    Jn = jt.jtype.shape[0]
    R = Jn * MAX_JOINT_ROWS

    a = jt.body_a
    b = jt.body_b
    jvalid = jt.valid & ~(state.asleep[a] & state.asleep[b])
    pos_a, orn_a = state.pos[a], state.orn[a]
    pos_b, orn_b = state.pos[b], state.orn[b]
    # joint pivots are authored in the ORIGIN frame; pos is the COM, so the
    # moment arm is R*(pivot - com) (reference: origin-aware constraint prep)
    rA = quat.rotate(orn_a, jt.pivot_a - state.com[a])
    rB = quat.rotate(orn_b, jt.pivot_b - state.com[b])
    pa_w = pos_a + rA
    pb_w = pos_b + rB
    va, wa = state.linvel[a], state.angvel[a]
    vb, wb = state.linvel[b], state.angvel[b]

    # joint frames in world space
    qa = quat.mul(orn_a, jt.frame_a)
    qb = quat.mul(orn_b, jt.frame_b)
    Ma = quat.to_matrix(qa)
    Mb = quat.to_matrix(qb)
    ax_a = Ma[..., :, 0]   # frame X axis = primary joint axis
    ay_a = Ma[..., :, 1]
    az_a = Ma[..., :, 2]
    ax_b = Mb[..., :, 0]
    ay_b = Mb[..., :, 1]
    az_b = Mb[..., :, 2]

    # row slots [Jn, MAX_JOINT_ROWS, ...]
    JlA = jnp.zeros((Jn, MAX_JOINT_ROWS, 3))
    JaA = jnp.zeros((Jn, MAX_JOINT_ROWS, 3))
    JlB = jnp.zeros((Jn, MAX_JOINT_ROWS, 3))
    JaB = jnp.zeros((Jn, MAX_JOINT_ROWS, 3))
    rhs = jnp.zeros((Jn, MAX_JOINT_ROWS))
    lower = jnp.full((Jn, MAX_JOINT_ROWS), -BIG)
    upper = jnp.full((Jn, MAX_JOINT_ROWS), BIG)
    rvalid = jnp.zeros((Jn, MAX_JOINT_ROWS), bool)

    is_ = lambda t: jt.jtype == t

    def set_row(slot, cond, jla, jaa, jlb, jab, r, lo=None, hi=None):
        nonlocal JlA, JaA, JlB, JaB, rhs, lower, upper, rvalid
        cond = cond & jvalid
        JlA = JlA.at[:, slot].set(jnp.where(cond[:, None], jla, JlA[:, slot]))
        JaA = JaA.at[:, slot].set(jnp.where(cond[:, None], jaa, JaA[:, slot]))
        JlB = JlB.at[:, slot].set(jnp.where(cond[:, None], jlb, JlB[:, slot]))
        JaB = JaB.at[:, slot].set(jnp.where(cond[:, None], jab, JaB[:, slot]))
        rhs = rhs.at[:, slot].set(jnp.where(cond, r, rhs[:, slot]))
        if lo is not None:
            lower = lower.at[:, slot].set(jnp.where(cond, lo, lower[:, slot]))
        if hi is not None:
            upper = upper.at[:, slot].set(jnp.where(cond, hi, upper[:, slot]))
        rvalid = rvalid.at[:, slot].set(rvalid[:, slot] | cond)

    zero3 = jnp.zeros((Jn, 3))
    err = pa_w - pb_w
    relvel_at = lambda d: (vec.dot(d, va) + vec.dot(vec.cross(rA, d), wa)
                           - vec.dot(d, vb) - vec.dot(vec.cross(rB, d), wb))

    # --- point / hinge / cvjoint share 3 positional lock rows (generic's
    # linear DOFs are per-axis limit rows below, reference
    # generic_constraint.cpp:22-125) ---
    point_like = is_(JointType.POINT) | is_(JointType.HINGE) | \
        is_(JointType.CVJOINT)
    world_axes = jnp.eye(3)
    for k in range(3):
        d = jnp.broadcast_to(world_axes[k], (Jn, 3))
        r = -(vec.dot(err, d) / dt * ERP + relvel_at(d))
        set_row(k, point_like, d, vec.cross(rA, d), -d, -vec.cross(rB, d), r)

    # --- distance: single row along the pivot separation ---
    dist_len = vec.length(err)
    d_dir = vec.normalize_or(err, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), err.shape))
    rest_len = jt.params[:, 0]
    r_dist = -((dist_len - rest_len) / dt * ERP + relvel_at(d_dir))
    set_row(0, is_(JointType.DISTANCE), d_dir, vec.cross(rA, d_dir),
            -d_dir, -vec.cross(rB, d_dir), r_dist)

    # --- soft distance: spring (exact impulse) + damper row ---
    # params: [rest_len, stiffness, damping]  (reference:
    # soft_distance_constraint.cpp — spring row with exact impulse, damper row
    # whose impulse is capped by the damping rate)
    stiff = jt.params[:, 1]
    damp = jt.params[:, 2]
    # lambda applies -d to B, so pulling a stretched spring together needs a
    # negative impulse
    spring_imp = -stiff * (dist_len - rest_len) * dt
    set_row(0, is_(JointType.SOFT_DISTANCE), d_dir, vec.cross(rA, d_dir),
            -d_dir, -vec.cross(rB, d_dir), jnp.zeros(Jn),
            lo=spring_imp, hi=spring_imp)
    damp_imp = damp * dt
    set_row(1, is_(JointType.SOFT_DISTANCE), d_dir, vec.cross(rA, d_dir),
            -d_dir, -vec.cross(rB, d_dir), -relvel_at(d_dir),
            lo=-damp_imp, hi=damp_imp)

    # --- tracked continuous twist/hinge angle (reference: update_angle state
    # on hinge/cvjoint/generic) — wraps accumulate so limits beyond +-pi work.
    # Twist measured after removing bend via shortest_arc (reference
    # cvjoint_constraint::relative_angle, generic_constraint.cpp:136-145);
    # for an aligned hinge this reduces to the plain atan2 formula.
    arc = quat.shortest_arc(ax_b, ax_a)
    yb_in_a = quat.rotate(quat.mul(quat.conjugate(orn_a),
                                   quat.mul(arc, orn_b)),
                          quat.rotate(jt.frame_b, jnp.broadcast_to(
                              jnp.array([0.0, 1.0, 0.0]), (Jn, 3))))
    fy_a = quat.rotate(jt.frame_a, jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0]), (Jn, 3)))
    fz_a = quat.rotate(jt.frame_a, jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0]), (Jn, 3)))
    inst_angle = jnp.arctan2(vec.dot(yb_in_a, fz_a), vec.dot(yb_in_a, fy_a))
    two_pi = 2.0 * jnp.pi
    delta = inst_angle - jnp.mod(jt.angle + jnp.pi, two_pi) + jnp.pi
    delta = jnp.mod(delta + jnp.pi, two_pi) - jnp.pi
    angle = jt.angle + delta
    new_angle = jnp.where(jvalid, angle, jt.angle)

    # --- hinge: 2 angular alignment rows + limits + friction/damping/spring
    # + bump stop (reference: hinge_constraint.cpp) ---
    # params: [limit_min, limit_max, limit_restitution, bump_stop_stiffness,
    #          bump_stop_angle, friction_torque, damping, spring_stiffness,
    #          spring_rest_angle, has_limit]
    hinge = is_(JointType.HINGE)
    # Alignment: rotation-error vector err = ax_b x ax_a is the small-angle
    # rotation that brings B's hinge axis onto A's; each transverse row u
    # drives dot(u, wa - wb) toward -dot(u, err)*erp/dt (reference:
    # hinge_constraint.cpp's two off-axis angular rows).
    err_axis = vec.cross(ax_b, ax_a)
    for k, u in enumerate((ay_a, az_a)):
        relw_u = vec.dot(u, wa) - vec.dot(u, wb)
        r = -(vec.dot(u, err_axis) / dt * ERP + relw_u)
        set_row(3 + k, hinge, zero3, u, zero3, -u, r)
    relw = vec.dot(ax_a, wa) - vec.dot(ax_a, wb)  # = -d(angle)/dt
    has_limit = jt.params[:, 9] > 0.5
    lim_min = jt.params[:, 0]
    lim_max = jt.params[:, 1]
    lim_rest = jt.params[:, 2]
    # ALWAYS-ON speculative limit row toward the nearest bound (reference:
    # hinge_constraint.cpp:91-113 — one-sided row with error =
    # (bound - angle)/dt, so an approaching swing sheds exactly the angular
    # velocity that would carry it past the limit; a gated-on-violation row
    # overshoots by the full approach speed before engaging)
    mid_h = 0.5 * (lim_min + lim_max)
    near_min_h = angle < mid_h
    lim_err = jnp.where(near_min_h, lim_min - angle, lim_max - angle)
    r_lim = -(lim_err / dt * ERP + relw * (1.0 + lim_rest))
    lo_lim = jnp.where(near_min_h, -BIG, 0.0)
    hi_lim = jnp.where(near_min_h, 0.0, BIG)
    set_row(5, hinge & has_limit, zero3, ax_a, zero3, -ax_a,
            r_lim, lo=lo_lim, hi=hi_lim)
    # friction + damping torque about the axis
    fr_t = jt.params[:, 5]
    dampg = jt.params[:, 6]
    max_fr = fr_t * dt + jnp.abs(relw) * dampg * dt
    set_row(6, hinge & (max_fr > 0), zero3, ax_a, zero3, -ax_a, -relw,
            lo=-max_fr, hi=max_fr)
    # torsional spring toward rest angle: exact spring impulse
    # (lambda applies -ax to B, so +k*(angle-rest)*dt torques B back)
    spring_k = jt.params[:, 7]
    rest_ang = jt.params[:, 8]
    spr_imp = spring_k * (angle - rest_ang) * dt
    set_row(7, hinge & (spring_k > 0), zero3, ax_a, zero3, -ax_a,
            jnp.zeros(Jn), lo=spr_imp, hi=spr_imp)
    # bump stop: one-sided spring near each limit (reference:
    # hinge_constraint.hpp:29-57 bump_stop_angle/stiffness)
    bump_k = jt.params[:, 3]
    bump_ang = jt.params[:, 4]
    bmin = lim_min + bump_ang
    bmax = lim_max - bump_ang
    bump_defl = jnp.where(angle < bmin, angle - bmin,
                          jnp.where(angle > bmax, angle - bmax, 0.0))
    bump_imp = bump_k * bump_defl * dt
    set_row(8, hinge & has_limit & (bump_k > 0) & (bump_ang > 0),
            zero3, ax_a, zero3, -ax_a, bump_defl / dt * ERP - relw,
            lo=jnp.minimum(bump_imp, 0.0), hi=jnp.maximum(bump_imp, 0.0))

    # --- cone: keep B's x-axis inside elliptic cone around A's x-axis ---
    # params: [span_y_tan, span_z_tan] (reference: cone_constraint.cpp)
    cone = is_(JointType.CONE)
    bx = jnp.stack([vec.dot(ax_b, ax_a), vec.dot(ax_b, ay_a),
                    vec.dot(ax_b, az_a)], -1)
    ty = jt.params[:, 0]
    tz = jt.params[:, 1]
    xpos = jnp.maximum(bx[:, 0], 1e-3)
    ey = bx[:, 1] / (xpos * jnp.maximum(ty, 1e-6))
    ez = bx[:, 2] / (xpos * jnp.maximum(tz, 1e-6))
    viol = ey * ey + ez * ez - 1.0
    violated = cone & (viol > 0)
    # u oriented so that positive impulse (which torques B along -u) rotates
    # ax_b toward ax_a
    u_corr = vec.normalize_or(vec.cross(ax_a, ax_b),
                              jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]),
                                               ax_a.shape))
    relw_c = vec.dot(u_corr, wa) - vec.dot(u_corr, wb)
    r_cone = viol * 0.5 / dt * ERP - relw_c
    set_row(8, violated, zero3, u_corr, zero3, -u_corr, r_cone, lo=0.0, hi=BIG)

    # --- generic 6-DOF: per-DOF limit / bump-stop / spring / friction rows
    # (reference: generic_constraint.cpp:1-330). params layout: 6 DOFs
    # (3 linear along frame-A axes, then 3 angular), 10 values each at
    # base d*10: [limit_enabled, min, max, limit_restitution,
    # bump_stop_size, bump_stop_stiffness, friction, rest,
    # spring_stiffness, damping]. Row slots: d*4 + (0 limit | 1 bump |
    # 2 spring | 3 friction/damping).
    gen = is_(JointType.GENERIC)
    axes_a = (ax_a, ay_a, az_a)
    pivot_off = pb_w - pa_w

    # angular DOF current angles (reference:136-160): dof 0 = tracked twist;
    # dof 1 = asin(dot(axisB_x, axisA_z)); dof 2 = asin(dot(axisB_x, axisA_y))
    ang1 = jnp.arcsin(jnp.clip(vec.dot(ax_b, az_a), -1.0, 1.0))
    ang2 = jnp.arcsin(jnp.clip(vec.dot(ax_b, ay_a), -1.0, 1.0))
    ax1 = vec.normalize_or(vec.cross(az_a, ax_b),
                           jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]),
                                            (Jn, 3)))
    ax2 = vec.normalize_or(vec.cross(ay_a, ax_b),
                           jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]),
                                            (Jn, 3)))

    for d in range(6):
        base = d * 10
        p_en = jt.params[:, base + 0] > 0.5
        p_min = jt.params[:, base + 1]
        p_max = jt.params[:, base + 2]
        p_rst = jt.params[:, base + 3]
        p_bsz = jt.params[:, base + 4]
        p_bk = jt.params[:, base + 5]
        p_fr = jt.params[:, base + 6]
        p_rest = jt.params[:, base + 7]
        p_k = jt.params[:, base + 8]
        p_dmp = jt.params[:, base + 9]
        nz_lim = p_min < p_max

        if d < 3:  # linear along frame-A axis d
            u = axes_a[d]
            jla, jaa, jlb, jab = u, vec.cross(rA, u), -u, -vec.cross(rB, u)
            # J.v = d(offset_proj)/dt with offset = pivotB - pivotA projected
            # on u... reference J is +u on A, so J.v = -d(offset)/dt
            coord = vec.dot(pivot_off, u)
            relv = relvel_at(u)
        else:      # angular about frame axis
            k = d - 3
            u = (ax_a, -ax1, -ax2)[k]
            jla = jlb = zero3
            jaa, jab = u, -u
            coord = (angle, ang1, ang2)[k]
            relv = vec.dot(u, wa) - vec.dot(u, wb)

        # relationship: J.v = -d(coord)/dt for angular dof0 (J = +ax_a;
        # d(angle)/dt = -relw) and for linear (J = +u on A: moving A along u
        # SHRINKS offset = pB - pA). So a positive impulse reduces coord.
        mid = 0.5 * (p_min + p_max)
        near_min = coord < mid
        lim_err = jnp.where(near_min, p_min - coord, p_max - coord)
        inside = (coord > p_min) & (coord < p_max)
        # limit row: one-sided when a real range exists, full lock otherwise
        lo_l = jnp.where(nz_lim, jnp.where(near_min, -BIG, 0.0), -BIG)
        hi_l = jnp.where(nz_lim, jnp.where(near_min, 0.0, BIG), BIG)
        # error: reference uses limit_error/dt inside the range (speculative
        # stop, erp 0.9 for linear limits), nothing when violated for linear
        # (position solver fixes it), -coord/dt for locked angular; row rhs
        # convention: rhs = -(error*erp + relvel*(1+restitution))
        # (src/edyn/constraints/constraint_row.cpp:21)
        error_v = jnp.where(
            nz_lim, jnp.where(inside, lim_err / dt, 0.0),
            jnp.where(d >= 3, -coord / dt, jnp.zeros_like(coord)))
        r_l = -(error_v * jnp.where(nz_lim & (d < 3), 0.9, ERP)
                + relv * (1.0 + jnp.where(nz_lim, p_rst, 0.0)))
        set_row(d * 4 + 0, gen & p_en, jla, jaa, jlb, jab, r_l,
                lo=lo_l, hi=hi_l)

        # bump stop: one-sided spring near each end of the range
        bmin_ = p_min + p_bsz
        bmax_ = p_max - p_bsz
        defl = jnp.where(coord < bmin_, coord - bmin_,
                         jnp.where(coord > bmax_, coord - bmax_, 0.0))
        b_imp = p_bk * defl * dt
        set_row(d * 4 + 1, gen & p_en & nz_lim & (p_bk > 0) & (p_bsz > 0),
                jla, jaa, jlb, jab, defl / dt * ERP - relv,
                lo=jnp.minimum(b_imp, 0.0), hi=jnp.maximum(b_imp, 0.0))

        # spring toward rest coordinate: exact impulse k*(coord-rest)*dt
        s_defl = coord - p_rest
        s_imp = p_k * s_defl * dt
        set_row(d * 4 + 2, gen & (p_k > 0), jla, jaa, jlb, jab,
                s_defl / dt * ERP - relv,
                lo=jnp.minimum(s_imp, 0.0), hi=jnp.maximum(s_imp, 0.0))

        # friction + damping
        f_imp = p_fr * dt + jnp.abs(relv) * p_dmp * dt
        set_row(d * 4 + 3, gen & ((p_fr > 0) | (p_dmp > 0)), jla, jaa,
                jlb, jab, -relv, lo=-f_imp, hi=f_imp)

    # --- cvjoint: twist limit/lock + bump stop + spring + friction/damping
    # about the per-body twist axes, plus bend friction/damping and bend
    # spring toward rest_direction (reference: cvjoint_constraint.cpp:1-302).
    # params: [twist_min, twist_max, twist_restitution, bump_stop_angle,
    # bump_stop_stiffness, friction_torque, rest_angle, stiffness, damping,
    # rest_direction xyz (9:12), bend_stiffness 12, bend_friction 13,
    # bend_damping 14]
    cv = is_(JointType.CVJOINT)
    relw_cv = vec.dot(ax_a, wa) - vec.dot(ax_b, wb)
    tw_min = jt.params[:, 0]
    tw_max = jt.params[:, 1]
    tw_rst = jt.params[:, 2]
    tw_nz = tw_min < tw_max
    tw_below = angle < 0.5 * (tw_min + tw_max)
    tw_err = jnp.where(tw_below, tw_min - angle, tw_max - angle)
    tw_inside = (angle > tw_min) & (angle < tw_max)
    r_tw = jnp.where(
        tw_nz,
        -(jnp.where(tw_inside, tw_err / dt, 0.0) * ERP
          + relw_cv * (1.0 + tw_rst)),
        -relw_cv)
    lo_tw = jnp.where(tw_nz, jnp.where(tw_below, -BIG, 0.0), -BIG)
    hi_tw = jnp.where(tw_nz, jnp.where(tw_below, 0.0, BIG), BIG)
    set_row(3, cv, zero3, ax_a, zero3, -ax_b, r_tw, lo=lo_tw, hi=hi_tw)

    # twist bump stop
    cb_ang = jt.params[:, 3]
    cb_k = jt.params[:, 4]
    cb_min = tw_min + cb_ang
    cb_max = tw_max - cb_ang
    cb_defl = jnp.where(angle < cb_min, angle - cb_min,
                        jnp.where(angle > cb_max, angle - cb_max, 0.0))
    cb_imp = cb_k * cb_defl * dt
    set_row(4, cv & tw_nz & (cb_k > 0) & (cb_ang > 0), zero3, ax_a,
            zero3, -ax_b, cb_defl / dt * ERP - relw_cv,
            lo=jnp.minimum(cb_imp, 0.0), hi=jnp.maximum(cb_imp, 0.0))

    # twist spring toward rest angle
    cs_k = jt.params[:, 7]
    cs_defl = angle - jt.params[:, 6]
    cs_imp = cs_k * cs_defl * dt
    set_row(5, cv & (cs_k > 0), zero3, ax_a, zero3, -ax_b,
            cs_defl / dt * ERP - relw_cv,
            lo=jnp.minimum(cs_imp, 0.0), hi=jnp.maximum(cs_imp, 0.0))

    # twist friction + damping
    cf_imp = jt.params[:, 5] * dt + jnp.abs(relw_cv) * jt.params[:, 8] * dt
    set_row(6, cv & (cf_imp > 0), zero3, ax_a, zero3, -ax_b, -relw_cv,
            lo=-cf_imp, hi=cf_imp)

    # bend friction + damping: resists the non-twist relative angular
    # velocity (reference:174-205)
    wrel_bend = (wa - vec.dot(wa, ax_a)[:, None] * ax_a) \
        - (wb - vec.dot(wb, ax_b)[:, None] * ax_b)
    bend_spd = vec.length(wrel_bend)
    bend_axis = vec.normalize_or(wrel_bend, ay_a)
    bf_imp = jt.params[:, 13] * dt + bend_spd * jt.params[:, 14] * dt
    set_row(7, cv & (bf_imp > 0), zero3, bend_axis, zero3, -bend_axis,
            -(vec.dot(bend_axis, wa) - vec.dot(bend_axis, wb)),
            lo=-bf_imp, hi=bf_imp)

    # bend spring: torque B's twist axis toward rest_direction (in A's
    # object space; reference:206-230)
    rest_dir_w = quat.rotate(orn_a, jt.params[:, 9:12])
    bspr_axis_raw = vec.cross(rest_dir_w, ax_b)
    sin_bend = jnp.clip(vec.length(bspr_axis_raw), -1.0, 1.0)
    bend_angle = jnp.arcsin(sin_bend)
    bspr_axis = vec.normalize_or(bspr_axis_raw, ay_a)
    bs_k = jt.params[:, 12]
    bs_imp = bs_k * bend_angle * dt
    set_row(8, cv & (bs_k > 0), zero3, bspr_axis, zero3, -bspr_axis,
            bend_angle / dt * ERP
            - (vec.dot(bspr_axis, wa) - vec.dot(bspr_axis, wb)),
            lo=jnp.minimum(bs_imp, 0.0), hi=jnp.maximum(bs_imp, 0.0))

    # --- flatten ---
    flat = lambda x: x.reshape((R,) + x.shape[2:])
    a_r = jnp.repeat(a, MAX_JOINT_ROWS)
    b_r = jnp.repeat(b, MAX_JOINT_ROWS)
    valid_r = flat(rvalid)
    inv_mA = jnp.where(valid_r, state.mass_inv[a_r], 0.0)
    inv_mB = jnp.where(valid_r, state.mass_inv[b_r], 0.0)
    Iw = state.inertia_world_inv()
    inv_IA = Iw[a_r] * valid_r[:, None, None]
    inv_IB = Iw[b_r] * valid_r[:, None, None]
    slot_groups = jnp.asarray([_slot_group(s) for s in range(MAX_JOINT_ROWS)],
                              jnp.int32)
    group_r = jnp.tile(slot_groups, (Jn,))
    if mass_splitting:
        # degree = incident JOINTS per body PER SOLVE GROUP (see N_GROUPS):
        # groups solve sequentially, and within a group one joint's rows
        # are orthogonal (or impulse-bounded), so only same-group rows of
        # DIFFERENT joints split the mass.
        degA = jnp.ones((R,))
        degB = jnp.ones((R,))
        for g in range(N_GROUPS):
            in_g = slot_groups == g
            jhas = jnp.any(rvalid & in_g[None, :], axis=1) & jvalid
            deg_g = degree_counts(state.capacity, [a, b], [jhas, jhas])
            sel = in_g[None, :].repeat(Jn, 0).reshape(-1)
            degA = jnp.where(sel, deg_g[a_r], degA)
            degB = jnp.where(sel, deg_g[b_r], degB)
    else:
        degA = degB = 1.0
    fJlA, fJaA, fJlB, fJaB = flat(JlA), flat(JaA), flat(JlB), flat(JaB)
    tA = jnp.einsum("rij,rj->ri", inv_IA, fJaA)
    tB = jnp.einsum("rij,rj->ri", inv_IB, fJaB)
    term = (vec.dot(fJlA, fJlA) * inv_mA * degA + vec.dot(tA, fJaA) * degA
            + vec.dot(fJlB, fJlB) * inv_mB * degB + vec.dot(tB, fJaB) * degB)
    em = jnp.where(term > 1e-12, 1.0 / jnp.maximum(term, 1e-12), 0.0)
    return JointRows(
        valid=valid_r, a=a_r, b=b_r, ab=jnp.concatenate([a_r, b_r]),
        JlA=fJlA, JaA=fJaA, JlB=fJlB, JaB=fJaB,
        inv_mA=inv_mA, inv_mB=inv_mB, tA=tA, tB=tB,
        eff_mass=em, rhs=flat(rhs), lower=flat(lower),
        upper=flat(upper), group=group_r), new_angle


def _apply(rows: JointRows, dlam, dvw):
    from ..dynamics.solver import scatter_add_ab
    dlam = jnp.where(rows.valid, dlam, 0.0)[:, None]
    return scatter_add_ab(dvw, rows.ab,
                          rows.inv_mA[:, None] * rows.JlA * dlam,
                          rows.tA * dlam,
                          rows.inv_mB[:, None] * rows.JlB * dlam,
                          rows.tB * dlam)


def warm_start_joints(rows: JointRows, impulses, dvw):
    return _apply(rows, impulses.reshape(-1), dvw)


def solve_joints_once(rows: JointRows, impulses, dvw):
    """One velocity iteration over the joint rows: the N_GROUPS solve
    groups run SEQUENTIALLY (each sees the previous group's deltas), rows
    within a group in parallel — near-GS convergence for the strongly
    coupled linear/transverse/axial directions of a single joint."""
    from ..dynamics.solver import gather_ab
    imp = impulses.reshape(-1)
    for g in range(N_GROUPS):
        in_g = rows.group == g
        dva, dwa, dvb, dwb = gather_ab(dvw, rows.ab)
        drel = (vec.dot(rows.JlA, dva) + vec.dot(rows.JaA, dwa)
                + vec.dot(rows.JlB, dvb) + vec.dot(rows.JaB, dwb))
        dlam = (rows.rhs - drel) * rows.eff_mass
        new = jnp.clip(imp + dlam, rows.lower, rows.upper)
        dlam = jnp.where(in_g, new - imp, 0.0)
        imp = jnp.where(in_g, new, imp)
        dvw = _apply(rows, dlam, dvw)
    return imp.reshape(impulses.shape), dvw


def solve_joint_positions(state, num_iterations: int = 3,
                          correction_rate: float = 0.8):
    """NGS position correction for joints (reference: the per-constraint
    solve_position methods driven by solve_position_constraints,
    src/edyn/dynamics/island_solver.cpp:250-353; hinge_constraint.cpp:180-215,
    cvjoint/generic likewise).

    Re-derives geometry each iteration from the CURRENT poses (unlike the
    contact NGS, which linearizes around step-start rows — joints are few, so
    exact re-rotation is cheap) and applies positional/angular corrections
    directly. This keeps the steady-state position error near zero, which in
    turn keeps the velocity rows' erp bias small — without it, a hanging
    chain's persistent error injects energy every step through the bias
    term."""
    import dataclasses as dc
    jt = state.joints
    Jn = jt.jtype.shape[0]
    N = state.capacity
    if Jn == 0 or num_iterations <= 0:
        return state

    is_ = lambda t: jt.jtype == t
    point_like = (is_(JointType.POINT) | is_(JointType.HINGE)
                  | is_(JointType.CVJOINT))
    axis_align = is_(JointType.HINGE) | is_(JointType.CVJOINT)
    gen = is_(JointType.GENERIC)
    a, b = jt.body_a, jt.body_b
    ab = jnp.concatenate([a, b])
    jvalid = jt.valid & ~(state.asleep[a] & state.asleep[b])

    pos = state.pos
    orn = state.orn
    inv_m = state.mass_inv

    def solve_row(pos, orn, Iw, d_a, ang_a, d_b, ang_b, error, active):
        """One position row: J = {d_a, ang_a, d_b, ang_b}; pushes error -> 0
        (reference position_solver::solve, position_solver.hpp:13-52)."""
        ima = jnp.where(active, inv_m[a], 0.0)
        imb = jnp.where(active, inv_m[b], 0.0)
        tA = jnp.einsum("jik,jk->ji", Iw[:Jn], ang_a)
        tB = jnp.einsum("jik,jk->ji", Iw[Jn:], ang_b)
        term = (vec.dot(d_a, d_a) * ima + vec.dot(tA, ang_a)
                + vec.dot(d_b, d_b) * imb + vec.dot(tB, ang_b))
        em = jnp.where(term > 1e-12, 1.0 / jnp.maximum(term, 1e-12), 0.0)
        # reference convention: correction = +error * rate * eff_mass applied
        # along J (position_solver.hpp:16-32)
        lam = (error * correction_rate * em)[:, None]
        lam = jnp.where(active[:, None], lam, 0.0)
        dpos = jnp.zeros((N, 3)).at[ab].add(
            jnp.concatenate([ima[:, None] * d_a * lam,
                             imb[:, None] * d_b * lam]))
        dang = jnp.zeros((N, 3)).at[ab].add(
            jnp.concatenate([tA * lam, tB * lam]))
        pos = pos + dpos
        orn = quat.integrate(orn, dang, 1.0)
        return pos, orn

    for _ in range(num_iterations):
        orn_ab = orn[ab]
        qa = quat.mul(orn_ab[:Jn], jt.frame_a)
        qb = quat.mul(orn_ab[Jn:], jt.frame_b)
        Ma = quat.to_matrix(qa)
        Mb = quat.to_matrix(qb)
        # world inverse inertia from the evolving orientations
        R = quat.to_matrix(orn_ab)
        Iw = jnp.einsum("rij,rjk,rlk->ril",
                        R, state.inertia_inv[ab], R)

        # --- angular: align primary axes (hinge/cvjoint) ---
        ax_a = Ma[..., :, 0]
        ax_b = Mb[..., :, 0]
        u = vec.cross(ax_a, ax_b)
        p, q = vec.orthonormal_basis(ax_a)
        z3 = jnp.zeros((Jn, 3))
        for tdir in (p, q):
            err = vec.dot(u, tdir)
            active = jvalid & axis_align & (jnp.abs(err) > 1e-9)
            pos, orn = solve_row(pos, orn, Iw, z3, tdir, z3, -tdir, err,
                                 active)
            orn_ab = orn[ab]
            R = quat.to_matrix(orn_ab)
            Iw = jnp.einsum("rij,rjk,rlk->ril", R, state.inertia_inv[ab], R)

        # --- hinge/cvjoint angular limit clamp (position level). The
        # velocity-level limit row alone converges slowly for long-arm
        # pendulums under batched mass-split GS (spin and orbit couple only
        # through the point rows), so violations are also corrected
        # positionally here — same role as the contact NGS for penetration.
        qa2 = quat.mul(orn_ab[:Jn], jt.frame_a)
        qb2 = quat.mul(orn_ab[Jn:], jt.frame_b)
        Ma2 = quat.to_matrix(qa2)
        Mb2 = quat.to_matrix(qb2)
        axh = Ma2[..., :, 0]
        cur = jnp.arctan2(vec.dot(Mb2[..., :, 1], Ma2[..., :, 2]),
                          vec.dot(Mb2[..., :, 1], Ma2[..., :, 1]))
        lim_mn = jt.params[:, 0]
        lim_mx = jt.params[:, 1]
        has_lim = (is_(JointType.HINGE) & (jt.params[:, 9] > 0.5)) \
            | (is_(JointType.CVJOINT) & (lim_mn < lim_mx))
        viol = jnp.where(cur < lim_mn, cur - lim_mn,
                         jnp.where(cur > lim_mx, cur - lim_mx, 0.0))
        active = jvalid & has_lim & (jnp.abs(viol) > 1e-9)
        pos, orn = solve_row(pos, orn, Iw, z3, axh, z3, -axh, viol, active)
        orn_ab = orn[ab]
        R = quat.to_matrix(orn_ab)
        Iw = jnp.einsum("rij,rjk,rlk->ril", R, state.inertia_inv[ab], R)

        # --- linear: join pivot points (pivots in origin frame; arm about
        # the COM: R*(pivot - com)) ---
        pos_ab = pos[ab]
        rA = quat.rotate(orn_ab[:Jn], jt.pivot_a - state.com[a])
        rB = quat.rotate(orn_ab[Jn:], jt.pivot_b - state.com[b])
        pA = pos_ab[:Jn] + rA
        pB = pos_ab[Jn:] + rB
        d = pA - pB
        err = vec.length(d)
        dirn = vec.normalize_or(d, jnp.broadcast_to(
            jnp.array([0.0, 1.0, 0.0]), d.shape))
        active = jvalid & point_like & (err > 1e-9)
        pos, orn = solve_row(pos, orn, Iw, dirn, vec.cross(rA, dirn),
                             -dirn, -vec.cross(rB, dirn), -err, active)

        # --- generic: per-axis linear limit violation correction
        # (reference: generic_constraint::solve_position) ---
        orn_ab = orn[ab]
        R = quat.to_matrix(orn_ab)
        Iw = jnp.einsum("rij,rjk,rlk->ril", R, state.inertia_inv[ab], R)
        qa = quat.mul(orn_ab[:Jn], jt.frame_a)
        Ma = quat.to_matrix(qa)
        pos_ab = pos[ab]
        # arms about the COM, matching build_joint_rows and the pivot-join
        # pass above: r = R * (pivot - com)
        rA = quat.rotate(orn_ab[:Jn], jt.pivot_a - state.com[a])
        rB = quat.rotate(orn_ab[Jn:], jt.pivot_b - state.com[b])
        off = (pos_ab[Jn:] + rB) - (pos_ab[:Jn] + rA)
        for d_ in range(3):
            base = d_ * 10
            p_en = jt.params[:, base] > 0.5
            p_min = jt.params[:, base + 1]
            p_max = jt.params[:, base + 2]
            u = Ma[..., :, d_]
            proj = vec.dot(off, u)
            errg = jnp.where(proj < p_min, proj - p_min,
                             jnp.where(proj > p_max, proj - p_max, 0.0))
            active = jvalid & gen & p_en & (jnp.abs(errg) > 1e-9)
            pos, orn = solve_row(pos, orn, Iw, u, vec.cross(rA, u),
                                 -u, -vec.cross(rB, u), errg, active)

    # immovable bodies never moved (inv_m = 0, inertia_inv = 0)
    return dc.replace(state, pos=pos, orn=orn)


def apply_gravity_joints(state, dt: float):
    """Pairwise gravitational attraction (reference:
    src/edyn/constraints/gravity_constraint.cpp). Applied directly to
    velocities, not as a solver row."""
    jt = state.joints
    G = 6.674e-11
    mask = jt.valid & (jt.jtype == JointType.GRAVITY)
    a, b = jt.body_a, jt.body_b
    d = state.pos[b] - state.pos[a]
    r2 = jnp.maximum(vec.length_sqr(d), 1e-12)
    dir_ = d / jnp.sqrt(r2)[:, None]
    mA = jnp.where(state.mass_inv[a] > 0, 1.0 / jnp.maximum(state.mass_inv[a], 1e-12), 0.0)
    mB = jnp.where(state.mass_inv[b] > 0, 1.0 / jnp.maximum(state.mass_inv[b], 1e-12), 0.0)
    F = jnp.where(mask, G * mA * mB / r2, 0.0)
    dva = dir_ * (F * state.mass_inv[a] * dt)[:, None]
    dvb = -dir_ * (F * state.mass_inv[b] * dt)[:, None]
    linvel = state.linvel.at[a].add(dva).at[b].add(dvb)
    return dataclasses.replace(state, linvel=linvel)
