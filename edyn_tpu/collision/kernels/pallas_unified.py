"""The unified convex-convex narrowphase as ONE Pallas TPU kernel.

Motivation (measured, r2): on the axon-relay runtime the physics step is
launch-bound — the XLA lowering of `support_sat.collide_support` is ~300
fused kernels and each dispatch costs 0.15-1 ms, so the unified bucket alone
is >100 ms/step at 10k bodies. This kernel runs the IDENTICAL math (axis
enumeration -> exact disc-swept support SAT -> rim refinement -> tilt patch
sampling -> feature-slab clip -> reduce-to-4) as one `pallas_call`:
grid over 128-pair lane blocks, all intermediates VMEM-resident, zero HBM
round-trips between stages.

Data layout: pair-side rows are packed COMPONENT-MAJOR and transposed to
[C, K] so that every per-pair scalar is a (1, BLK) lane vector and every
structure dim (verts V, faces F, edges E, axes X) is a sublane dim — the
natural VPU shape. Vectors are 3-tuples of (G, BLK) arrays; quaternion math
is written out component-wise.

Parity contract: `collide_support_pallas(...)` must match
`support_sat.collide_support` (tested in tests/test_pallas_narrowphase.py);
the jnp path remains the reference implementation and the fallback for
axis_validity/orient_ref callers (mesh kernels).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .support_sat import TILT

BLK = 128
EPS = 1e-12


# ---------------------------------------------------------------------------
# component-wise vector/quaternion helpers on (G, BLK) tuples
# ---------------------------------------------------------------------------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _length(a):
    return jnp.sqrt(jnp.maximum(_dot(a, a), 0.0))


def _normalize_or(a, fallback, eps=1e-9):
    """Mirror math.vec.normalize_or exactly (l^2 test, EPS=1e-9)."""
    l2 = _dot(a, a)
    ok = l2 > eps
    inv = 1.0 / jnp.sqrt(jnp.maximum(l2, eps))
    return (jnp.where(ok, a[0] * inv, fallback[0]),
            jnp.where(ok, a[1] * inv, fallback[1]),
            jnp.where(ok, a[2] * inv, fallback[2]))


def _normalize(a, eps=1e-9):
    """Mirror math.vec.normalize exactly (zeros for near-zero vectors)."""
    l2 = _dot(a, a)
    inv = jnp.where(l2 > eps, 1.0 / jnp.sqrt(jnp.maximum(l2, eps)), 0.0)
    return (a[0] * inv, a[1] * inv, a[2] * inv)


def _qrotate(q, v):
    """q = (x,y,z,w) of (1,BLK); v 3-tuple of (G,BLK)."""
    qv = (q[0], q[1], q[2])
    t = _scale(_cross(qv, v), 2.0)
    return _add(_add(v, _scale(t, q[3])), _cross(qv, t))


def _qrotate_inv(q, v):
    qc = (-q[0], -q[1], -q[2], q[3])
    return _qrotate(qc, v)


def _ortho_basis(n):
    """Mirror math.vec.orthonormal_basis exactly (Duff et al. branchless
    ONB) — the tangent basis steers patch sampling, so any deviation from
    the jnp path changes the selected contact points."""
    nx, ny, nz = n
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t1 = (1.0 + sign * nx * nx * a, sign * b, -sign * nx)
    t2 = (b, sign + ny * ny * a, -ny)
    return t1, t2


def _first_onehot(mask, axis=0):
    """First True along ``axis`` -> onehot float (iota/min formulation —
    Mosaic-friendly, no cumsum on a major axis)."""
    G = mask.shape[axis]
    iota = jax.lax.broadcasted_iota(jnp.int32, mask.shape, axis)
    idx = jnp.min(jnp.where(mask, iota, G), axis=axis, keepdims=True)
    return jnp.where((iota == idx) & mask, 1.0, 0.0)


def _argmax_sel(vals, *gather):
    """Select rows of each (G, BLK) array in ``gather`` at argmax of vals
    (axis 0). Returns list of (1, BLK) arrays (+ the max value first)."""
    m = jnp.max(vals, axis=0, keepdims=True)
    oh = _first_onehot(vals >= m)
    out = [m]
    for g in gather:
        out.append(jnp.sum(g * oh, axis=0, keepdims=True))
    return out


def _argmin_sel(vals, *gather):
    out = _argmax_sel(-vals, *gather)
    out[0] = -out[0]
    return out


# ---------------------------------------------------------------------------
# packing: component-major transposed side table
# ---------------------------------------------------------------------------

def pack_side_table_t(state):
    """[C, N] transposed, component-major packed side table. Layout rows:
    pos 0:3 | orn 3:7 | radius 7 | disc_r 8 | disc_axis 9:12 |
    verts x V | y V | z V | vert_mask V |
    face x F | y F | z F | face_mask F |
    edge x E | y E | z E | edge_mask E."""
    cx = state.convex
    N = state.capacity
    Ncx = cx.verts.shape[0]
    V = cx.verts.shape[1]
    F = cx.face_normals.shape[1]
    E = cx.edge_dirs.shape[1]
    f = lambda x: x.astype(jnp.float32)

    def pad(x):
        if Ncx < N:
            return jnp.pad(x, ((0, N - Ncx),) + ((0, 0),) * (x.ndim - 1))
        return x[:N]

    def cm(x):  # [N, G, 3] -> [3G, N] component-major
        return x.transpose(2, 1, 0).reshape(3 * x.shape[1], x.shape[0])

    rows = [state.origin_pos().T, state.orn.T,
            pad(f(cx.radius))[None, :], pad(f(cx.disc_r))[None, :],
            pad(f(cx.disc_axis)).T,
            cm(pad(cx.verts)), pad(f(cx.vert_mask)).T,
            cm(pad(cx.face_normals)), pad(f(cx.face_mask)).T,
            cm(pad(cx.edge_dirs)), pad(f(cx.edge_mask)).T]
    return jnp.concatenate(rows, axis=0), (V, F, E)


def _unpack(ref, dims):
    V, F, E = dims
    o = [0]

    def cut(n):
        s = ref[o[0]:o[0] + n, :]
        o[0] += n
        return s

    pos = tuple(cut(1) for _ in range(3))
    orn = tuple(cut(1) for _ in range(4))
    radius = cut(1)
    disc_r = cut(1)
    disc_axis = tuple(cut(1) for _ in range(3))
    verts = (cut(V), cut(V), cut(V))
    vmask = cut(V) > 0.5
    faces = (cut(F), cut(F), cut(F))
    fmask = cut(F) > 0.5
    edges = (cut(E), cut(E), cut(E))
    emask = cut(E) > 0.5
    return dict(pos=pos, orn=orn, radius=radius, disc_r=disc_r,
                disc_axis=disc_axis, verts=verts, vert_mask=vmask,
                faces=faces, face_mask=fmask, edges=edges, edge_mask=emask)


# ---------------------------------------------------------------------------
# in-kernel building blocks (mirror support.py / support_sat.py)
# ---------------------------------------------------------------------------

def _world(S):
    """World verts (V,BLK), world disc axis (1,BLK), world faces, edges."""
    vw = _add(_qrotate(tuple(S["orn"]), S["verts"]),
              tuple(jnp.broadcast_to(c, S["verts"][0].shape)
                    for c in S["pos"]))
    w = _qrotate(tuple(S["orn"]), S["disc_axis"])
    fw = _qrotate(tuple(S["orn"]), S["faces"])
    ew = _qrotate(tuple(S["orn"]), S["edges"])
    return vw, w, fw, ew


def _support_projection(S, vw, w, d):
    """max over shape of dot(x, d) for axes d = 3-tuple of (X, BLK)."""
    X = d[0].shape[0]
    V = vw[0].shape[0]
    proj = (d[0][:, None, :] * vw[0][None, :, :]
            + d[1][:, None, :] * vw[1][None, :, :]
            + d[2][:, None, :] * vw[2][None, :, :])        # (X,V,BLK)
    proj = jnp.where(S["vert_mask"][None, :, :], proj, -1e30)
    base = jnp.max(proj, axis=1)                            # (X,BLK)
    dw = _dot(d, w)
    perp2 = jnp.maximum(_dot(d, d) - dw * dw, 0.0)
    return base + S["radius"] + S["disc_r"] * jnp.sqrt(perp2)


def _support_point(S, vw, w, d):
    """Support point for unit dirs d (X,BLK): returns 3-tuple (X,BLK)."""
    proj = (d[0][:, None, :] * vw[0][None, :, :]
            + d[1][:, None, :] * vw[1][None, :, :]
            + d[2][:, None, :] * vw[2][None, :, :])
    proj = jnp.where(S["vert_mask"][None, :, :], proj, -1e30)
    m = jnp.max(proj, axis=1, keepdims=True)
    oh = _first_onehot(proj >= m, axis=1)                   # (X,V,BLK)
    base = tuple(jnp.sum(vw[c][None, :, :] * oh, axis=1) for c in range(3))
    dw = _dot(d, w)
    perp = _sub(d, _scale((jnp.broadcast_to(w[0], d[0].shape),
                           jnp.broadcast_to(w[1], d[0].shape),
                           jnp.broadcast_to(w[2], d[0].shape)), dw))
    plen = _length(perp)
    disc = _scale(perp, S["disc_r"] / jnp.maximum(plen, EPS))
    return tuple(base[c] + d[c] * S["radius"] + disc[c] for c in range(3))


def _closest_on_circle(c, w, r, x):
    u = _sub(x, c)
    perp = _sub(u, _scale(w, _dot(u, w)))
    t1, _ = _ortho_basis(w)
    dirn = _normalize_or(perp, t1)
    return _add(c, _scale(dirn, r))


def _closest_on_segment(q0, q1, x):
    d = _sub(q1, q0)
    dd = _dot(d, d)
    t = jnp.clip(_dot(_sub(x, q0), d) / jnp.maximum(dd, EPS), 0.0, 1.0)
    return _add(q0, _scale(d, t))


def _deepest_vert(S, vw, d):
    """Deepest masked vert along d (1,BLK)-tuple."""
    proj = _dot((d[0], d[1], d[2]),
                (vw[0], vw[1], vw[2]))  # broadcast (1,BLK)x(V,BLK)->(V,BLK)
    proj = jnp.where(S["vert_mask"], proj, -1e30)
    _, x, y, z = _argmax_sel(proj, vw[0], vw[1], vw[2])
    return (x, y, z)


def _top2_verts(S, vw, d):
    proj = _dot(d, vw)
    proj = jnp.where(S["vert_mask"], proj, -1e30)
    m = jnp.max(proj, axis=0, keepdims=True)
    oh0 = _first_onehot(proj >= m)
    q0 = tuple(jnp.sum(vw[c] * oh0, 0, keepdims=True) for c in range(3))
    proj2 = jnp.where(oh0 > 0.5, -1e30, proj)
    m2, x, y, z = _argmax_sel(proj2, vw[0], vw[1], vw[2])
    has2 = m2 > -1e29
    q1 = (jnp.where(has2, x, q0[0]), jnp.where(has2, y, q0[1]),
          jnp.where(has2, z, q0[2]))
    return q0, q1


def _rim_axes(A, vwA, wA, B, vwB, wB, seed, iters=8):
    def one(C_, vwC, wC, D_, vwD, wD):
        nseed = tuple(-s for s in seed)
        cC = _deepest_vert(C_, vwC, nseed)
        rC = C_["disc_r"]
        d_is_disc = D_["disc_r"] > 1e-9
        cD = _deepest_vert(D_, vwD, seed)
        q0, q1 = _top2_verts(D_, vwD, seed)

        def closest_D(p):
            oc = _closest_on_circle(cD, wD, D_["disc_r"], p)
            os_ = _closest_on_segment(q0, q1, p)
            return tuple(jnp.where(d_is_disc, oc[c], os_[c])
                         for c in range(3))

        p = _closest_on_circle(cC, wC, rC, cD)
        q = p
        for _ in range(iters):
            q = closest_D(p)
            p = _closest_on_circle(cC, wC, rC, q)
        ax = _sub(p, q)
        ok = jnp.where((C_["disc_r"] > 1e-9) & (_length(ax) > 1e-7), 1.0, 0.0)
        return _normalize_or(ax, seed), ok

    ax_a, ok_a = one(A, vwA, wA, B, vwB, wB)
    ax_b, ok_b = one(B, vwB, wB, A, vwA, wA)
    return (tuple(jnp.concatenate([ax_a[c], ax_b[c]], 0) for c in range(3)),
            jnp.concatenate([ok_a, ok_b], 0))


def _line_feature_dir(S, vw, d):
    proj = _dot(d, vw)
    proj = jnp.where(S["vert_mask"], proj, -1e30)
    maxp = jnp.max(proj, axis=0, keepdims=True)
    feat = (proj >= maxp - 1e-3) & S["vert_mask"]
    featf = jnp.where(feat, 1.0, 0.0)
    cnt = jnp.sum(featf, 0, keepdims=True)
    cen = tuple(jnp.sum(vw[c] * featf, 0, keepdims=True)
                / jnp.maximum(cnt, 1.0) for c in range(3))
    diffs = tuple(jnp.where(feat, vw[c] - cen[c], 0.0) for c in range(3))
    d2 = _dot(diffs, diffs)
    _, ex, ey, ez = _argmax_sel(d2, diffs[0], diffs[1], diffs[2])
    return (ex, ey, ez), cnt == 2.0


def _flat_feature(S, vw, w, d):
    proj = _dot(d, vw)
    proj = jnp.where(S["vert_mask"], proj, -1e30)
    maxp = jnp.max(proj, axis=0, keepdims=True)
    cnt = jnp.sum(jnp.where(proj >= maxp - 1e-3, 1.0, 0.0), 0, keepdims=True)
    cap = (S["disc_r"] > 1e-9) & (jnp.abs(_dot(d, w)) > 0.99)
    return (S["radius"] < 1e-9) & ((cnt >= 2.0) | cap)


def _feature_slab(S, vw, w, d, t):
    proj = _dot(d, vw)
    proj = jnp.where(S["vert_mask"], proj, -1e30)
    maxp = jnp.max(proj, axis=0, keepdims=True)
    feat = proj >= maxp - 1e-3
    vt = _dot(t, vw)
    lo = jnp.min(jnp.where(feat, vt, 1e30), 0, keepdims=True)
    hi = jnp.max(jnp.where(feat, vt, -1e30), 0, keepdims=True)
    off = S["radius"] * _dot(d, t)
    dw = _dot(d, w)
    perp = _sub(d, _scale(w, dw))
    plen = _length(perp)
    cap = jnp.abs(dw) > 0.99
    tw = _sub(t, _scale(w, _dot(t, w)))
    disc_span = S["disc_r"] * _length(tw)
    rim_off = S["disc_r"] * _dot(perp, t) / jnp.maximum(plen, EPS)
    lo = lo + off + jnp.where(cap, -disc_span, rim_off)
    hi = hi + off + jnp.where(cap, disc_span, rim_off)
    return lo, hi


def _make_kernel(dims, threshold, rim_axes):
    V, F, E = dims

    def kernel(a_ref, b_ref, o_ref):
        A = _unpack(a_ref, dims)
        B = _unpack(b_ref, dims)
        vwA, wA, fwA, ewA = _world(A)
        vwB, wB, fwB, ewB = _world(B)
        one = jnp.ones_like(A["radius"])
        zero = jnp.zeros_like(one)

        delta = _sub(tuple(A["pos"]), tuple(B["pos"]))
        ydef = (zero, one, zero)
        seed = _normalize_or(delta, ydef)

        # --- candidate axes (component-wise concat along axis 0) ---
        ax_list = [[], [], []]
        m_list = []

        def add_axes(v3, mask):
            for c in range(3):
                ax_list[c].append(v3[c])
            m_list.append(mask)

        def side_axes(S, fw, w, other_pos):
            # masks travel as f32 (0/1): Mosaic cannot concatenate i1 vregs
            add_axes(fw, jnp.where(S["face_mask"], 1.0, 0.0))
            d = _sub(other_pos, tuple(S["pos"]))
            add_axes(_normalize_or(d, ydef), one)
            perp = _sub(d, _scale(w, _dot(d, w)))
            plen = _length(perp)
            side_n = _scale(perp, 1.0 / jnp.maximum(plen, EPS))
            add_axes(side_n, jnp.where((S["disc_r"] > 1e-9)
                                       & (plen > 1e-9), 1.0, 0.0))

        side_axes(A, fwA, wA, tuple(B["pos"]))
        side_axes(B, fwB, wB, tuple(A["pos"]))

        # edge cross products (E*E, BLK)
        BLKd = one.shape[1]
        eax = tuple(jnp.broadcast_to(ewA[c][:, None, :],
                                     (E, E, BLKd)).reshape(E * E, BLKd)
                    for c in range(3))
        ebx = tuple(jnp.broadcast_to(ewB[c][None, :, :],
                                     (E, E, BLKd)).reshape(E * E, BLKd)
                    for c in range(3))
        crm = (jnp.broadcast_to(A["edge_mask"][:, None, :], (E, E, BLKd))
               & jnp.broadcast_to(B["edge_mask"][None, :, :],
                                  (E, E, BLKd))).reshape(E * E, BLKd)
        cr = _cross(eax, ebx)
        crl = _length(cr)
        cr = _scale(cr, 1.0 / jnp.maximum(crl, EPS))
        add_axes(cr, jnp.where(crm & (crl > 1e-6), 1.0, 0.0))

        if rim_axes:
            ra, ram = _rim_axes(A, vwA, wA, B, vwB, wB, seed)
            add_axes(ra, ram)

        axes = tuple(jnp.concatenate(ax_list[c], axis=0) for c in range(3))
        amask = jnp.concatenate(m_list, axis=0)  # f32 0/1

        # orient toward A
        sgn = jnp.where(_dot(axes, delta) >= 0, 1.0, -1.0)
        axes = _scale(axes, sgn)

        # separation per axis
        neg = tuple(-a for a in axes)
        pa_proj = -_support_projection(A, vwA, wA, neg)
        pb_proj = _support_projection(B, vwB, wB, axes)
        sep = jnp.where(amask > 0.5, pa_proj - pb_proj, -1e30)
        best_sep, nx, ny, nz, plane_a, plane_b = _argmax_sel(
            sep, axes[0], axes[1], axes[2], pa_proj, pb_proj)
        n = (nx, ny, nz)

        # --- tangent basis aligned to line features ---
        nn = tuple(-c for c in n)
        eA, lineA = _line_feature_dir(A, vwA, nn)
        eB, lineB = _line_feature_dir(B, vwB, n)
        e = tuple(jnp.where(lineB, eB[c], eA[c]) for c in range(3))
        e_t = _sub(e, _scale(n, _dot(e, n)))
        use_line = (lineA | lineB) & (_length(e_t) > 1e-6)
        t1d, t2d = _ortho_basis(n)
        e_tn = _normalize_or(e_t, t1d)
        t1 = tuple(jnp.where(use_line, e_tn[c], t1d[c]) for c in range(3))
        t2c = _cross(n, t1)
        t2 = tuple(jnp.where(use_line, t2c[c], t2d[c]) for c in range(3))

        # --- patch sampling: 5 tilted dirs per side ---
        def tilt_dirs(base):
            dx = jnp.concatenate([
                base[0], base[0] + TILT * t1[0], base[0] - TILT * t1[0],
                base[0] + TILT * t2[0], base[0] - TILT * t2[0]], 0)
            dy = jnp.concatenate([
                base[1], base[1] + TILT * t1[1], base[1] - TILT * t1[1],
                base[1] + TILT * t2[1], base[1] - TILT * t2[1]], 0)
            dz = jnp.concatenate([
                base[2], base[2] + TILT * t1[2], base[2] - TILT * t1[2],
                base[2] + TILT * t2[2], base[2] - TILT * t2[2]], 0)
            return _normalize((dx, dy, dz))

        dirs_a = tilt_dirs(nn)
        dirs_b = tilt_dirs(n)
        pa_pts = _support_point(A, vwA, wA, dirs_a)       # (5,BLK)
        pb_pts = _support_point(B, vwB, wB, dirs_b)

        depth_a = _dot(pa_pts, n) - plane_b
        depth_b = plane_a - _dot(pb_pts, n)

        on_a = tuple(jnp.concatenate(
            [pa_pts[c], pb_pts[c] + n[c] * depth_b], 0) for c in range(3))
        on_b = tuple(jnp.concatenate(
            [pa_pts[c] - n[c] * depth_a, pb_pts[c]], 0) for c in range(3))
        depth = jnp.concatenate([depth_a, depth_b], 0)    # (10,BLK)
        valid = (depth < threshold) & (best_sep < threshold)

        # --- feature-slab containment / clamp ---
        both_flat = _flat_feature(A, vwA, wA, nn) & _flat_feature(B, vwB, wB, n)
        shift = [jnp.zeros_like(on_a[0]) for _ in range(3)]
        for t in (t1, t2):
            lo_a, hi_a = _feature_slab(A, vwA, wA, nn, t)
            lo_b, hi_b = _feature_slab(B, vwB, wB, n, t)
            lo = jnp.maximum(lo_a, lo_b)
            hi = jnp.maximum(jnp.minimum(hi_a, hi_b), lo)
            proj = _dot(on_a, t)
            inside = (proj >= lo - 5e-3) & (proj <= hi + 5e-3)
            valid = valid & (inside | both_flat)
            clipped = jnp.clip(proj, lo, hi)
            dmove = jnp.where(both_flat, clipped - proj, 0.0)
            for c in range(3):
                shift[c] = shift[c] + dmove * t[c]
        on_a = tuple(on_a[c] + shift[c] for c in range(3))
        on_b = tuple(on_b[c] + shift[c] for c in range(3))
        shifted = (shift[0] ** 2 + shift[1] ** 2 + shift[2] ** 2) > EPS
        sel_depth = depth + jnp.where(shifted, 1e-5, 0.0)

        # --- reduce to <=4 (insertion heuristic) ---
        big = 1e30
        d0 = jnp.where(valid, sel_depth, big)
        m0, p0x, p0y, p0z, dd0, bx0, by0, bz0 = _argmin_sel(
            d0, on_a[0], on_a[1], on_a[2], depth, on_b[0], on_b[1], on_b[2])
        v0 = m0 < big * 0.5
        p0 = (p0x, p0y, p0z)
        taken = _first_onehot(d0 <= m0) > 0.5

        dist0 = ((on_a[0] - p0[0]) ** 2 + (on_a[1] - p0[1]) ** 2
                 + (on_a[2] - p0[2]) ** 2)
        c1 = jnp.where(valid & ~taken, dist0, -big)
        m1, p1x, p1y, p1z, dd1, bx1, by1, bz1 = _argmax_sel(
            c1, on_a[0], on_a[1], on_a[2], depth, on_b[0], on_b[1], on_b[2])
        v1 = v0 & (m1 > 0)
        p1 = (p1x, p1y, p1z)
        oh1 = _first_onehot(c1 >= m1)
        taken = taken | (oh1 > 0.5)

        e01 = _sub(p1, p0)
        rel = tuple((on_a[c] - p0[c]) for c in range(3))
        crs = _cross(rel, tuple(jnp.broadcast_to(e01[c], rel[0].shape)
                                for c in range(3)))
        area = _dot(crs, crs)
        c2 = jnp.where(valid & ~taken, area, -big)
        m2, p2x, p2y, p2z, dd2, bx2, by2, bz2 = _argmax_sel(
            c2, on_a[0], on_a[1], on_a[2], depth, on_b[0], on_b[1], on_b[2])
        v2 = v1 & (m2 > EPS)
        p2 = (p2x, p2y, p2z)
        oh2 = _first_onehot(c2 >= m2)
        taken = taken | (oh2 > 0.5)

        d_all = dist0 \
            + (on_a[0] - p1[0]) ** 2 + (on_a[1] - p1[1]) ** 2 \
            + (on_a[2] - p1[2]) ** 2 \
            + (on_a[0] - p2[0]) ** 2 + (on_a[1] - p2[1]) ** 2 \
            + (on_a[2] - p2[2]) ** 2
        c3 = jnp.where(valid & ~taken, d_all, -big)
        m3, p3x, p3y, p3z, dd3, bx3, by3, bz3 = _argmax_sel(
            c3, on_a[0], on_a[1], on_a[2], depth, on_b[0], on_b[1], on_b[2])
        v3 = v2 & (m3 > 0)

        picks = [((p0x, p0y, p0z), (bx0, by0, bz0), dd0, v0),
                 ((p1x, p1y, p1z), (bx1, by1, bz1), dd1, v1),
                 ((p2x, p2y, p2z), (bx2, by2, bz2), dd2, v2),
                 ((p3x, p3y, p3z), (bx3, by3, bz3), dd3, v3)]

        # --- assemble output: per point 12 rows ---
        orow = []
        for pa_w, pb_w, dd, vv in picks:
            vv = vv & (dd < threshold)
            piv_a = _qrotate_inv(tuple(A["orn"]),
                                 _sub(pa_w, tuple(A["pos"])))
            piv_b = _qrotate_inv(tuple(B["orn"]),
                                 _sub(pb_w, tuple(B["pos"])))
            orow += [piv_a[0], piv_a[1], piv_a[2],
                     piv_b[0], piv_b[1], piv_b[2],
                     n[0], n[1], n[2],
                     zero,                       # attachment NONE
                     dd,
                     jnp.where(vv, 1.0, 0.0)]
        o_ref[:, :] = jnp.concatenate(orow, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "threshold", "rim_axes",
                                             "interpret"))
def collide_support_pallas(a_rows_t, b_rows_t, dims, threshold: float,
                           rim_axes: bool = True, interpret: bool = False):
    """a_rows_t/b_rows_t: [C, K] gathered transposed side rows (K padded to a
    BLK multiple). Returns packed points [K, 4, 12] in the narrowphase blk
    layout (pivot_a 0:3 | pivot_b 3:6 | normal 6:9 | attachment 9 |
    distance 10 | point_valid 11)."""
    C, K = a_rows_t.shape
    assert K % BLK == 0
    kernel = _make_kernel(dims, threshold, rim_axes)
    out = pl.pallas_call(
        kernel,
        grid=(K // BLK,),
        in_specs=[
            pl.BlockSpec((C, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((48, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((48, K), jnp.float32),
        interpret=interpret,
    )(a_rows_t, b_rows_t)
    return out.T.reshape(K, 4, 12)
