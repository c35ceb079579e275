"""Velocity/restitution/NGS iteration math as single Pallas TPU kernels.

Motivation (measured, r4/r5): on the launch-overhead-bound axon runtime the
solve phase dominates dispatch count — each velocity iteration's XLA lowering
is ~20 fused kernels dispatched per while-loop trip (8 trips), the restitution
pre-pass inner solves are ~16/trip, and NGS ~16/trip. The math between the
per-iteration gather and scatter is purely elementwise over rows, which is
exactly one `pallas_call`: this module packs the row constants produced by
``solver.build_contact_rows`` into ONE component-major [C, R] table per step
and runs each iteration as

    XLA gather (dvw_t[:, ab]) -> pallas kernel -> XLA scatter-add

i.e. 3-4 dispatches per iteration instead of ~20. In-kernel dynamic
gather/scatter is NOT used (Mosaic cannot lower it on this runtime —
scripts/probe_pallas_gather.py); the gathers stay in XLA where they cost
~0.03 ms.

The kernels mirror ``solver.solve_contacts_once`` / ``solver.solve_restitution``
inner body / ``position.solve_positions`` body EXACTLY (same clamping order,
same friction-circle projection; reference semantics SURVEY A.1/A.2,
src/edyn/constraints/constraint_row.cpp:6-58,
src/edyn/constraints/constraint_row_friction.cpp:11-55). Parity is tested in
tests/test_pallas_solver.py against the jnp path (interpret mode on CPU).

Data layout: body velocity deltas travel TRANSPOSED [6, N] through the solve
loop so the per-iteration gather/scatter index the minor (lane) axis and the
kernel reads (1, BLK) lane vectors without any per-iteration transpose.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
BIG = 1e18


# ---------------------------------------------------------------------------
# const-table packing
# ---------------------------------------------------------------------------

# Row layout of the packed table (component-major, [C, R]).
# Base block (always present):
#   n 0:3 | t1 3:6 | t2 6:9
#   rn.JaA 9:12 | rn.JaB 12:15 | rn.tA 15:18 | rn.tB 18:21
#   r1.JaA 21:24 | r1.JaB 24:27 | r1.tA 27:30 | r1.tB 30:33
#   r2.JaA 33:36 | r2.JaB 36:39 | r2.tA 39:42 | r2.tB 42:45
#   em_n 45 | em_1 46 | em_2 47 | rhs_n 48 | rhs_1 49 | rhs_2 50
#   inv_mA 51 | inv_mB 52 | friction 53 | upper_n 54 | valid 55
#   restitution 56 | rA 57:60 | rB 60:63 | base_dist 63 | ngs_valid 64
C_BASE = 65
# Spin/roll block (appended when rows.sA_n is not None):
#   sA_n +0:3 | sB_n +3:6 | sA_t1 +6:9 | sB_t1 +9:12 | sA_t2 +12:15
#   sB_t2 +15:18 | roll_t1 +18:21 | roll_t2 +21:24
#   em_spin +24 | em_roll1 +25 | em_roll2 +26
#   rhs_spin +27 | rhs_roll1 +28 | rhs_roll2 +29 | spin_f +30 | roll_f +31
C_SR = 32


def pack_rows_t(rows):
    """Pack the per-row solve constants into ONE [C, Rp] f32 table (Rp padded
    to a BLK multiple) + padded endpoint indices. Built once per solve phase;
    every iteration kernel reads lane blocks of it."""
    R = rows.valid.shape[0]
    Rp = -(-R // BLK) * BLK
    pad = Rp - R

    def p1(x):  # [R] -> [1, Rp]
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.pad(x, (0, pad))
        return x[None, :]

    def p3(x):  # [R,3] -> [3, Rp]
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        return x.T

    parts = [
        p3(rows.n), p3(rows.t1), p3(rows.t2),
        p3(rows.rn.JaA), p3(rows.rn.JaB), p3(rows.rn.tA), p3(rows.rn.tB),
        p3(rows.r1.JaA), p3(rows.r1.JaB), p3(rows.r1.tA), p3(rows.r1.tB),
        p3(rows.r2.JaA), p3(rows.r2.JaB), p3(rows.r2.tA), p3(rows.r2.tB),
        p1(rows.rn.eff_mass), p1(rows.r1.eff_mass), p1(rows.r2.eff_mass),
        p1(rows.rn.rhs), p1(rows.r1.rhs), p1(rows.r2.rhs),
        p1(rows.inv_mA), p1(rows.inv_mB), p1(rows.friction),
        p1(jnp.minimum(rows.upper_n, BIG)), p1(rows.valid),
        p1(rows.restitution), p3(rows.rA), p3(rows.rB), p1(rows.base_dist),
        p1(rows.valid & ~rows.soft),
    ]
    if rows.sA_n is not None:
        parts += [
            p3(rows.sA_n), p3(rows.sB_n), p3(rows.sA_t1), p3(rows.sB_t1),
            p3(rows.sA_t2), p3(rows.sB_t2), p3(rows.roll_t1), p3(rows.roll_t2),
            p1(rows.em_spin), p1(rows.em_roll1), p1(rows.em_roll2),
            p1(rows.rhs_spin), p1(rows.rhs_roll1), p1(rows.rhs_roll2),
            p1(rows.spin_friction), p1(rows.roll_friction),
        ]
    tbl = jnp.concatenate(parts, axis=0)
    a_p = jnp.pad(rows.a, (0, pad)) if pad else rows.a
    b_p = jnp.pad(rows.b, (0, pad)) if pad else rows.b
    return tbl, a_p, b_p, Rp


def _cut(ref, o, n):
    s = ref[o[0]:o[0] + n, :]
    o[0] += n
    return s


def _unpack_base(ref):
    o = [0]
    d = {}
    for name in ("n", "t1", "t2", "JaA_n", "JaB_n", "tA_n", "tB_n",
                 "JaA_1", "JaB_1", "tA_1", "tB_1",
                 "JaA_2", "JaB_2", "tA_2", "tB_2"):
        d[name] = tuple(_cut(ref, o, 1) for _ in range(3))
    for name in ("em_n", "em_1", "em_2", "rhs_n", "rhs_1", "rhs_2",
                 "inv_mA", "inv_mB", "friction", "upper_n", "valid",
                 "restitution"):
        d[name] = _cut(ref, o, 1)
    d["rA"] = tuple(_cut(ref, o, 1) for _ in range(3))
    d["rB"] = tuple(_cut(ref, o, 1) for _ in range(3))
    d["base_dist"] = _cut(ref, o, 1)
    d["ngs_valid"] = _cut(ref, o, 1)
    return d, o


def _unpack_sr(ref, o):
    d = {}
    for name in ("sA_n", "sB_n", "sA_t1", "sB_t1", "sA_t2", "sB_t2",
                 "roll_t1", "roll_t2"):
        d[name] = tuple(_cut(ref, o, 1) for _ in range(3))
    for name in ("em_spin", "em_roll1", "em_roll2", "rhs_spin", "rhs_roll1",
                 "rhs_roll2", "spin_f", "roll_f"):
        d[name] = _cut(ref, o, 1)
    return d


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _drel(d, JaA, JaB, dva, dwa, dvb, dwb):
    """relative velocity of the row direction against the gathered deltas
    (matches solver.solve_contacts_once drel)."""
    return (_dot3(d, dva) + _dot3(JaA, dwa)
            - _dot3(d, dvb) + _dot3(JaB, dwb))


# ---------------------------------------------------------------------------
# velocity-iteration kernel
# ---------------------------------------------------------------------------

def _make_vel_kernel(with_sr: bool):
    def kernel(t_ref, imp_ref, ga_ref, gb_ref, oimp_ref, oupd_ref):
        C, o = _unpack_base(t_ref)
        SR = _unpack_sr(t_ref, o) if with_sr else None
        dva = tuple(ga_ref[c:c + 1, :] for c in range(3))
        dwa = tuple(ga_ref[c + 3:c + 4, :] for c in range(3))
        dvb = tuple(gb_ref[c:c + 1, :] for c in range(3))
        dwb = tuple(gb_ref[c + 3:c + 4, :] for c in range(3))
        n_imp = imp_ref[0:1, :]
        f1 = imp_ref[1:2, :]
        f2 = imp_ref[2:3, :]
        s_imp = imp_ref[3:4, :]
        ri1 = imp_ref[4:5, :]
        ri2 = imp_ref[5:6, :]

        # normal
        dlam = (C["rhs_n"] - _drel(C["n"], C["JaA_n"], C["JaB_n"],
                                   dva, dwa, dvb, dwb)) * C["em_n"]
        new_n = jnp.clip(n_imp + dlam, 0.0, C["upper_n"])
        dn = new_n - n_imp

        # friction circle against the UPDATED normal impulse
        d1 = (C["rhs_1"] - _drel(C["t1"], C["JaA_1"], C["JaB_1"],
                                 dva, dwa, dvb, dwb)) * C["em_1"]
        d2 = (C["rhs_2"] - _drel(C["t2"], C["JaA_2"], C["JaB_2"],
                                 dva, dwa, dvb, dwb)) * C["em_2"]
        imp1 = f1 + d1
        imp2 = f2 + d2
        max_len = C["friction"] * new_n
        ln = jnp.sqrt(imp1 * imp1 + imp2 * imp2)
        scale = jnp.where(ln > jnp.maximum(max_len, 1e-12),
                          max_len / jnp.maximum(ln, 1e-12), 1.0)
        imp1 = imp1 * scale
        imp2 = imp2 * scale
        df1 = imp1 - f1
        df2 = imp2 - f2

        ok = C["valid"] > 0.5
        m = lambda x: jnp.where(ok, x, 0.0)
        dn_ = m(dn)
        df1_ = m(df1)
        df2_ = m(df2)

        lin = tuple(C["n"][c] * dn_ + C["t1"][c] * df1_ + C["t2"][c] * df2_
                    for c in range(3))
        ua_l = tuple(C["inv_mA"] * lin[c] for c in range(3))
        ub_l = tuple(-C["inv_mB"] * lin[c] for c in range(3))
        ua_a = [C["tA_n"][c] * dn_ + C["tA_1"][c] * df1_ + C["tA_2"][c] * df2_
                for c in range(3)]
        ub_a = [C["tB_n"][c] * dn_ + C["tB_1"][c] * df1_ + C["tB_2"][c] * df2_
                for c in range(3)]

        if with_sr:
            rel_s = _dot3(C["n"], dwa) - _dot3(C["n"], dwb)
            max_s = SR["spin_f"] * new_n
            new_s = jnp.clip(s_imp + (SR["rhs_spin"] - rel_s) * SR["em_spin"],
                             -max_s, max_s)
            ds = new_s - s_imp
            max_r = SR["roll_f"] * new_n
            dr1 = (SR["rhs_roll1"] - (_dot3(SR["roll_t1"], dwa)
                                      - _dot3(SR["roll_t1"], dwb))) \
                * SR["em_roll1"]
            dr2 = (SR["rhs_roll2"] - (_dot3(SR["roll_t2"], dwa)
                                      - _dot3(SR["roll_t2"], dwb))) \
                * SR["em_roll2"]
            r1n = ri1 + dr1
            r2n = ri2 + dr2
            lr = jnp.sqrt(r1n * r1n + r2n * r2n)
            sc = jnp.where(lr > jnp.maximum(max_r, 1e-12),
                           max_r / jnp.maximum(lr, 1e-12), 1.0)
            r1n = r1n * sc
            r2n = r2n * sc
            ds_ = m(ds)
            dr1_ = m(r1n - ri1)
            dr2_ = m(r2n - ri2)
            for c in range(3):
                ua_a[c] = ua_a[c] + SR["sA_n"][c] * ds_ \
                    + SR["sA_t1"][c] * dr1_ + SR["sA_t2"][c] * dr2_
                ub_a[c] = ub_a[c] + SR["sB_n"][c] * ds_ \
                    + SR["sB_t1"][c] * dr1_ + SR["sB_t2"][c] * dr2_
            s_out, r1_out, r2_out = new_s, r1n, r2n
        else:
            s_out, r1_out, r2_out = s_imp, ri1, ri2

        oimp_ref[:, :] = jnp.concatenate(
            [new_n, imp1, imp2, s_out, r1_out, r2_out], axis=0)
        oupd_ref[:, :] = jnp.concatenate(
            list(ua_l) + list(ua_a) + list(ub_l) + list(ub_a), axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("with_sr", "interpret"))
def solve_iteration_pallas(tbl, imp_t, g, with_sr: bool,
                           interpret: bool = False):
    """One velocity iteration's math. tbl [C,Rp] const table; imp_t [6,Rp]
    accumulated impulses; g [6,2Rp] gathered endpoint deltas (a-half then
    b-half). Returns (new imp_t [6,Rp], upd [12,Rp]: ua 0:6 | ub 6:12)."""
    C, Rp = tbl.shape
    nblk = Rp // BLK
    kernel = _make_vel_kernel(with_sr)
    oimp, oupd = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((C, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLK), lambda i, _n=nblk: (0, i + _n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((6, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, Rp), jnp.float32),
            jax.ShapeDtypeStruct((12, Rp), jnp.float32),
        ],
        interpret=interpret,
    )(tbl, imp_t, g, g)
    return oimp, oupd


# ---------------------------------------------------------------------------
# restitution inner-iteration kernel (normal + friction only, dynamic rhs)
# ---------------------------------------------------------------------------

def _make_rest_kernel():
    def kernel(t_ref, dyn_ref, imp_ref, ga_ref, gb_ref, oimp_ref, oupd_ref):
        C, _ = _unpack_base(t_ref)
        rhs_n = dyn_ref[0:1, :]
        active = dyn_ref[1:2, :] > 0.5
        dva = tuple(ga_ref[c:c + 1, :] for c in range(3))
        dwa = tuple(ga_ref[c + 3:c + 4, :] for c in range(3))
        dvb = tuple(gb_ref[c:c + 1, :] for c in range(3))
        dwb = tuple(gb_ref[c + 3:c + 4, :] for c in range(3))
        n_i = imp_ref[0:1, :]
        f1 = imp_ref[1:2, :]
        f2 = imp_ref[2:3, :]

        dlam = (rhs_n - _drel(C["n"], C["JaA_n"], C["JaB_n"],
                              dva, dwa, dvb, dwb)) * C["em_n"]
        new_n = jnp.maximum(n_i + dlam, 0.0)
        dn = new_n - n_i
        d1 = -_drel(C["t1"], C["JaA_1"], C["JaB_1"],
                    dva, dwa, dvb, dwb) * C["em_1"]
        d2 = -_drel(C["t2"], C["JaA_2"], C["JaB_2"],
                    dva, dwa, dvb, dwb) * C["em_2"]
        imp1 = f1 + d1
        imp2 = f2 + d2
        max_len = C["friction"] * new_n
        ln = jnp.sqrt(imp1 * imp1 + imp2 * imp2)
        sc = jnp.where(ln > jnp.maximum(max_len, 1e-12),
                       max_len / jnp.maximum(ln, 1e-12), 1.0)
        imp1 = imp1 * sc
        imp2 = imp2 * sc
        mm = lambda x: jnp.where(active, x, 0.0)
        dn_ = mm(dn)
        df1_ = mm(imp1 - f1)
        df2_ = mm(imp2 - f2)
        lin = tuple(C["n"][c] * dn_ + C["t1"][c] * df1_ + C["t2"][c] * df2_
                    for c in range(3))
        ua_l = tuple(C["inv_mA"] * lin[c] for c in range(3))
        ub_l = tuple(-C["inv_mB"] * lin[c] for c in range(3))
        ua_a = tuple(C["tA_n"][c] * dn_ + C["tA_1"][c] * df1_
                     + C["tA_2"][c] * df2_ for c in range(3))
        ub_a = tuple(C["tB_n"][c] * dn_ + C["tB_1"][c] * df1_
                     + C["tB_2"][c] * df2_ for c in range(3))
        oimp_ref[:, :] = jnp.concatenate([new_n, imp1, imp2], axis=0)
        oupd_ref[:, :] = jnp.concatenate(
            list(ua_l) + list(ua_a) + list(ub_l) + list(ub_a), axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def restitution_iteration_pallas(tbl, dyn, imp3_t, g, interpret: bool = False):
    """One restitution inner iteration. dyn [2,Rp]: rhs_n | active."""
    C, Rp = tbl.shape
    nblk = Rp // BLK
    oimp, oupd = pl.pallas_call(
        _make_rest_kernel(),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((C, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLK), lambda i, _n=nblk: (0, i + _n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, Rp), jnp.float32),
            jax.ShapeDtypeStruct((12, Rp), jnp.float32),
        ],
        interpret=interpret,
    )(tbl, dyn, imp3_t, g, g)
    return oimp, oupd


def _make_relvel_kernel():
    def kernel(t_ref, ga_ref, gb_ref, o_ref):
        C, _ = _unpack_base(t_ref)
        va = tuple(ga_ref[c:c + 1, :] for c in range(3))
        wa = tuple(ga_ref[c + 3:c + 4, :] for c in range(3))
        vb = tuple(gb_ref[c:c + 1, :] for c in range(3))
        wb = tuple(gb_ref[c + 3:c + 4, :] for c in range(3))
        o_ref[:, :] = _drel(C["n"], C["JaA_n"], C["JaB_n"], va, wa, vb, wb)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def relvel_pallas(tbl, g, interpret: bool = False):
    """Normal-direction relative velocity per row from gathered endpoint
    velocities g [6,2Rp]. Returns [1,Rp]."""
    C, Rp = tbl.shape
    nblk = Rp // BLK
    return pl.pallas_call(
        _make_relvel_kernel(),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((C, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLK), lambda i, _n=nblk: (0, i + _n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        interpret=interpret,
    )(tbl, g, g)


# ---------------------------------------------------------------------------
# NGS position-iteration kernel
# ---------------------------------------------------------------------------

def _make_ngs_kernel(rate: float, max_corr: float):
    def kernel(t_ref, ga_ref, gb_ref, oupd_ref, oerr_ref):
        C, _ = _unpack_base(t_ref)
        dpa = tuple(ga_ref[c:c + 1, :] for c in range(3))
        daa = tuple(ga_ref[c + 3:c + 4, :] for c in range(3))
        dpb = tuple(gb_ref[c:c + 1, :] for c in range(3))
        dab = tuple(gb_ref[c + 3:c + 4, :] for c in range(3))

        def cross(a, b):
            return (a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0])

        ca = cross(daa, C["rA"])
        cb = cross(dab, C["rB"])
        corr_rel = tuple(dpa[c] + ca[c] - dpb[c] - cb[c] for c in range(3))
        dist = C["base_dist"] + _dot3(corr_rel, C["n"])
        error = jnp.clip(-dist, 0.0, max_corr)
        error = jnp.where(C["ngs_valid"] > 0.5, error, 0.0)
        lam = error * rate * C["em_n"]
        ua_l = tuple(C["inv_mA"] * C["n"][c] * lam for c in range(3))
        ua_a = tuple(C["tA_n"][c] * lam for c in range(3))
        ub_l = tuple(-C["inv_mB"] * C["n"][c] * lam for c in range(3))
        ub_a = tuple(C["tB_n"][c] * lam for c in range(3))
        oupd_ref[:, :] = jnp.concatenate(
            list(ua_l) + list(ua_a) + list(ub_l) + list(ub_a), axis=0)
        oerr_ref[:, :] = error

    return kernel


@functools.partial(jax.jit, static_argnames=("rate", "max_corr", "interpret"))
def ngs_iteration_pallas(tbl, g, rate: float, max_corr: float,
                         interpret: bool = False):
    """One NGS iteration: returns (upd [12,Rp], error [1,Rp])."""
    C, Rp = tbl.shape
    nblk = Rp // BLK
    upd, err = pl.pallas_call(
        _make_ngs_kernel(rate, max_corr),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((C, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, BLK), lambda i, _n=nblk: (0, i + _n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((12, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((12, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        ],
        interpret=interpret,
    )(tbl, g, g)
    return upd, err
