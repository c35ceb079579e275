"""Narrowphase: contact generation over the pair list in FIVE kernel
invocations.

Replaces the reference's double-dispatch ``visit_shape x visit_shape ->
collide(shA, shB)`` over 28 bespoke kernels
(src/edyn/util/collision_util.cpp:440-475,
src/edyn/collision/narrowphase.cpp:21-109). Pairs are partitioned into bucket
CLASSES rather than type pairs — on TPU, each bucket costs a kernel
invocation and launch overhead dominates, so the whole convex matrix runs
through the unified support-SAT kernel (shapes/convex.py rationale):

  1. UNIFIED    — any convex vs convex (exact for sphere/capsule/box/
                  cylinder/poly via disc-swept support + feature-slab clip)
  2. BOXBOX     — box vs box (bespoke SAT face clipping: its full polygon
                  clip yields deeper-quality patches than the support-sampled
                  patch — stacks collapse without it, measured r2)
  3. PLANE      — any convex vs plane (unified cloud+rim vs halfspace;
                  cylinders exact via disc rim candidates — the bespoke
                  cylinder-plane bucket is folded in, one launch fewer)
  4. MESH       — any convex vs triangle mesh (unified, Voronoi-filtered)

Results scatter into the manifold table and merge with persistent points for
warm-start continuity (manifold.merge_points).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.state import KIND_STATIC
from ..math import quat
from ..shapes.params import ShapeType
from .kernels import box_box, primitives
from .kernels.common import ContactResult
from .kernels.compound import (
    collide_compound_compound, collide_compound_convex, collide_compound_mesh,
    collide_compound_plane,
)
from .kernels.mesh import collide_convex_mesh
from .kernels.plane_unified import collide_convex_plane
from .kernels.support import Side
from .kernels.support_sat import collide_support
from .manifold import merge_points

S = ShapeType

# bucket classes
B_UNIFIED, B_BOXBOX, B_PLANE, B_CYLPLANE, B_MESH = 0, 1, 2, 3, 4
B_COMP_CONVEX, B_COMP_PLANE, B_COMP_COMP, B_COMP_MESH = 5, 6, 7, 8


def _is_convex(t):
    return ((t == S.SPHERE) | (t == S.BOX) | (t == S.CAPSULE)
            | (t == S.CYLINDER) | (t == S.POLYHEDRON))


def _is_mesh(t):
    return (t == S.MESH) | (t == S.PAGED_MESH)


def classify(ta, tb):
    """Returns (bucket_class, swap) — swap puts the convex body first for
    plane/mesh buckets. Invalid combinations get class -1."""
    cls = jnp.full(ta.shape, -1, jnp.int32)
    both_convex = _is_convex(ta) & _is_convex(tb)
    cls = jnp.where(both_convex, B_UNIFIED, cls)
    cls = jnp.where((ta == S.BOX) & (tb == S.BOX), B_BOXBOX, cls)
    plane_b = _is_convex(ta) & (tb == S.PLANE)
    plane_a = (ta == S.PLANE) & _is_convex(tb)
    cls = jnp.where(plane_a | plane_b, B_PLANE, cls)
    mesh_b = _is_convex(ta) & _is_mesh(tb)
    mesh_a = _is_mesh(ta) & _is_convex(tb)
    cls = jnp.where(mesh_a | mesh_b, B_MESH, cls)
    comp_a = ta == S.COMPOUND
    comp_b = tb == S.COMPOUND
    cls = jnp.where((comp_a & _is_convex(tb)) | (_is_convex(ta) & comp_b),
                    B_COMP_CONVEX, cls)
    cls = jnp.where((comp_a & (tb == S.PLANE)) | ((ta == S.PLANE) & comp_b),
                    B_COMP_PLANE, cls)
    cls = jnp.where(comp_a & comp_b, B_COMP_COMP, cls)
    cls = jnp.where((comp_a & _is_mesh(tb)) | (_is_mesh(ta) & comp_b),
                    B_COMP_MESH, cls)
    # swap so the convex/compound lead side is A
    swap = plane_a | mesh_a | (_is_convex(ta) & comp_b) | \
        ((ta == S.PLANE) & comp_b) | (_is_mesh(ta) & comp_b)
    return cls, swap


def _gather_side(state, idx) -> Side:
    cx = state.convex
    return Side(pos=state.origin_pos()[idx], orn=state.orn[idx],
                params=state.shape_params[idx],
                verts=cx.verts[idx], vert_mask=cx.vert_mask[idx],
                radius=cx.radius[idx],
                face_normals=cx.face_normals[idx],
                face_mask=cx.face_mask[idx],
                edge_dirs=cx.edge_dirs[idx], edge_mask=cx.edge_mask[idx],
                disc_r=cx.disc_r[idx], disc_axis=cx.disc_axis[idx])


def _compact_sel(mask, cap: int, fill: int):
    """Ascending indices of set bits padded with ``fill`` — cumsum/scatter
    compaction instead of jnp.nonzero's sort lowering (dispatch-lean).
    Returns (indices, ok, dropped-count)."""
    from .broadphase import _compact
    loc, cnt = _compact(mask, cap)
    ok = loc >= 0
    return jnp.where(ok, loc, fill), ok, jnp.maximum(cnt - cap, 0)


def _classes_present(types_present: frozenset):
    """Static: which bucket classes can occur given the shape types."""
    conv = [t for t in types_present if t in
            (S.SPHERE, S.BOX, S.CAPSULE, S.CYLINDER, S.POLYHEDRON)]
    out = []
    if len(conv) >= 1:
        out.append(B_UNIFIED)
    if S.BOX in types_present:
        out.append(B_BOXBOX)
    if S.PLANE in types_present and conv:
        out.append(B_PLANE)
    if (S.MESH in types_present or S.PAGED_MESH in types_present) and conv:
        out.append(B_MESH)
    if S.COMPOUND in types_present:
        if conv:
            out.append(B_COMP_CONVEX)
        if S.PLANE in types_present:
            out.append(B_COMP_PLANE)
        out.append(B_COMP_COMP)
        if S.MESH in types_present or S.PAGED_MESH in types_present:
            out.append(B_COMP_MESH)
    return out


def _use_pallas(mode):
    """Static decision: run the unified bucket as the Pallas mega-kernel.
    None = auto (TPU-family backends only — the CPU interpreter is slow)."""
    if mode is not None:
        return bool(mode)
    import jax
    try:
        # positive check: only TPU-family backends can lower the pltpu
        # kernel (a CUDA/ROCm backend must fall back to the jnp path)
        backend = jax.default_backend()
        return backend == "tpu" or backend.startswith("tpu") \
            or backend == "axon"
    except Exception:
        return False


def update_contacts(state, man, threshold: float, types_present: frozenset,
                    bucket_cap: int | None = None, dt: float = 1.0 / 60.0,
                    pallas_mode=None):
    """Run the applicable bucket-class kernels over the manifold pair list and
    merge fresh points into ``man`` (the carried-over manifold table)."""
    M = man.key.shape[0]
    cap = bucket_cap or M
    ta = state.shape_type[man.body_a]
    tb = state.shape_type[man.body_b]
    cls, swap = classify(ta, tb)
    # sleeping pairs are skipped entirely (reference: sleeping_tag exclusion
    # in the narrowphase view, island_manager.cpp:541-596): neither body
    # moved, so merge_points' retention path keeps their points (distance
    # refresh sees identical transforms) and impulses frozen. This also
    # shrinks the live bucket counts that gate the chunked kernels below.
    # a side is inactive when asleep OR static (an asleep box on a static
    # plane is a sleeping manifold too); kinematic bodies stay active — their
    # motion must re-detect contacts and wake neighbors
    inactive = state.asleep | ((state.kind == KIND_STATIC) & state.valid)
    frozen = inactive[man.body_a] & inactive[man.body_b]
    # reference detect_collision pre-check (collision_util.cpp:440-475):
    # TIGHT AABBs inflated by contact_breaking_threshold. Candidate pairs
    # come from the admission boxes (tight + velocity sweep + separation
    # margin), so pairs in the margin band can produce no points (kernels
    # bail at distance > threshold) and any stale carried points are
    # necessarily beyond breaking — prune them, matching the reference's
    # unmatched-point destruction (collision_util.cpp:397-413).
    from ..config import CONTACT_BREAKING_THRESHOLD as _BT
    pre = (jnp.all(state.aabb_min[man.body_a] - _BT
                   <= state.aabb_max[man.body_b], -1)
           & jnp.all(state.aabb_max[man.body_a] + _BT
                     >= state.aabb_min[man.body_b], -1))
    cls = jnp.where(man.valid & ~frozen & pre, cls, -1)
    stale = man.valid & ~frozen & ~pre
    man = dataclasses.replace(
        man, point_valid=man.point_valid & ~stale[:, None])

    # packed per-bucket results scatter into ONE [M,4,14] buffer (superset of
    # solver.pack_manifold_points: pivot_a 0:3 | pivot_b 3:6 | normal 6:9 |
    # attachment 9 | distance 10 | point_valid 11 | friction_scale 12 |
    # restitution_scale 13)
    new_pts = jnp.zeros((M, 4, 14))
    dropped = jnp.zeros((), jnp.int32)

    from .kernels.support import pack_side_table, side_from_packed
    packed, dims = pack_side_table(state)
    use_pallas = _use_pallas(pallas_mode)

    present = _classes_present(types_present)

    for bucket in present:
        want = cls == bucket
        # per-class width budgets (any truncation is counted in `dropped` and
        # surfaced via overflow counters): the unified bucket dominates pair
        # counts; plane/boxbox are sized down so their kernels don't run at
        # full manifold width (measured 7x oversized on the 10k pile)
        if bucket == B_UNIFIED:
            # full manifold capacity (a settled dense pile makes nearly every
            # pair convex-convex), processed in two chunks — the second only
            # EXECUTES (lax.cond) when the live count spills past the first,
            # so early/sparse phases pay half the kernel width
            this_cap = min(2 * cap, M)
        elif bucket == B_PLANE:
            this_cap = max(512, cap // 4)
        else:
            this_cap = max(512, cap // 4)
        sel, sel_ok, bucket_dropped = _compact_sel(want, this_cap, M)
        dropped = dropped + bucket_dropped
        sel_c = jnp.minimum(sel, M - 1)
        a = man.body_a[sel_c]
        b = man.body_b[sel_c]
        sw = swap[sel_c]
        ka = jnp.where(sw, b, a)
        kb = jnp.where(sw, a, b)

        has_cyl = S.CYLINDER in types_present
        if bucket == B_UNIFIED and use_pallas:
            # the whole bucket as ONE Pallas mega-kernel (gather -> kernel ->
            # scatter: 3 dispatches instead of ~300 on a launch-bound runtime)
            from .kernels.pallas_unified import (
                BLK, collide_support_pallas, pack_side_table_t)
            packed_t, dims_t = pack_side_table_t(state)
            Kp = -(-this_cap // BLK) * BLK
            ka_p = jnp.pad(ka, (0, Kp - this_cap))
            kb_p = jnp.pad(kb, (0, Kp - this_cap))

            def run_chunk(ka_c, kb_c):
                return collide_support_pallas(
                    packed_t[:, ka_c], packed_t[:, kb_c], dims_t,
                    float(threshold), rim_axes=has_cyl)

            # chunk ladder: the bucket runs in 4 quarter-width chunks, each
            # EXECUTING (lax.cond) only when the live count spills into it —
            # a mostly-asleep world pays one quarter-chunk, a settled pile
            # ~3, only a full table all 4 (cost tracks the awake pair count,
            # reference: sleeping view exclusion island_manager.cpp:541-596)
            H = max(BLK, (Kp // 4 // BLK) * BLK)
            n_live = jnp.sum(want)
            parts = []
            start = 0
            while start < Kp:
                end = min(start + H, Kp)
                sz = end - start
                if start == 0:
                    parts.append(run_chunk(ka_p[:end], kb_p[:end]))
                else:
                    parts.append(jax.lax.cond(
                        n_live > start,
                        lambda s=start, e=end: run_chunk(ka_p[s:e], kb_p[s:e]),
                        lambda s=start, e=end: jnp.zeros((e - s, 4, 12))))
                start = end
            blk_out = jnp.concatenate(parts)[:this_cap] if len(parts) > 1 \
                else parts[0][:this_cap]
            pv = (blk_out[..., 11] > 0.5) & sel_ok[:, None]
            blk = jnp.concatenate([
                blk_out[..., :11],
                pv.astype(jnp.float32)[..., None],
                jnp.ones(blk_out.shape[:2] + (2,)),
            ], axis=-1)
            new_pts = new_pts.at[sel].set(blk, mode="drop")
            continue

        A = side_from_packed(packed[ka], dims)
        B = side_from_packed(packed[kb], dims)

        if bucket == B_UNIFIED:
            res: ContactResult = collide_support(A, B, threshold,
                                                 rim_axes=has_cyl)
        elif bucket == B_BOXBOX:
            res = box_box.collide_box_box(A.pos, A.orn, A.params,
                                          B.pos, B.orn, B.params, threshold)
        elif bucket == B_PLANE:
            res = collide_convex_plane(A, B, threshold)
        elif bucket == B_CYLPLANE:
            res = primitives.collide_cylinder_plane(
                A.pos, A.orn, A.params, B.pos, B.orn, B.params, threshold)
        elif bucket == B_MESH:
            res = collide_convex_mesh(A, B, threshold,
                                      mesh_table=state.mesh,
                                      mesh_index=state.shape_index[kb],
                                      rim_axes=has_cyl)
        elif bucket == B_COMP_CONVEX:
            # A = compound; swap orientation: the convex other body is B
            res = collide_compound_convex(state, ka, kb, A, B, threshold)
        elif bucket == B_COMP_PLANE:
            res = collide_compound_plane(state, ka, kb, A, B, threshold)
        elif bucket == B_COMP_MESH:
            res = collide_compound_mesh(state, ka, kb, A, B, threshold,
                                        rim_axes=has_cyl)
        else:  # B_COMP_COMP
            res = collide_compound_compound(state, ka, kb, A, B, threshold)

        res_sw = res.swapped()
        pv = jnp.where(sw[:, None], res_sw.point_valid, res.point_valid) & sel_ok[:, None]
        pa = jnp.where(sw[:, None, None], res_sw.pivot_a, res.pivot_a)
        pb = jnp.where(sw[:, None, None], res_sw.pivot_b, res.pivot_b)
        nr = jnp.where(sw[:, None, None], res_sw.normal, res.normal)
        at = jnp.where(sw[:, None], res_sw.attachment, res.attachment)
        ds = res.distance

        blk = jnp.concatenate([
            pa, pb, nr, at.astype(jnp.float32)[..., None], ds[..., None],
            pv.astype(jnp.float32)[..., None],
            res.friction_scale[..., None], res.restitution_scale[..., None],
        ], axis=-1)
        new_pts = new_pts.at[sel].set(blk, mode="drop")

    # rolling analogue of the reference's rolling_tag: round dynamic shapes
    rolling = (((state.shape_type == S.SPHERE) | (state.shape_type == S.CAPSULE)
                | (state.shape_type == S.CYLINDER)) & state.is_dynamic)
    org = state.origin_pos()

    def _merge(man_t, pts_t):
        """Point merge for a (possibly sliced) table: fresh-point unpack,
        object-space normal storage (reference: contact_point_geometry local
        normal; re-rotated at row build and in the position solver —
        attachment NONE keeps the world normal), pair poses for retention."""
        new_pivot_a = pts_t[..., 0:3]
        new_pivot_b = pts_t[..., 3:6]
        new_normal = pts_t[..., 6:9]
        new_attach = pts_t[..., 9].astype(jnp.int32)
        new_dist = pts_t[..., 10]
        new_valid = pts_t[..., 11] > 0.5
        new_scales = pts_t[..., 12:14]
        orn_a = state.orn[man_t.body_a][:, None, :]
        orn_b = state.orn[man_t.body_b][:, None, :]
        local_n = jnp.where(
            (new_attach == 1)[..., None], quat.rotate_inv(orn_a, new_normal),
            jnp.where((new_attach == 2)[..., None],
                      quat.rotate_inv(orn_b, new_normal), new_normal))
        pose = (org[man_t.body_a], orn_a[:, 0], state.angvel[man_t.body_a],
                rolling[man_t.body_a],
                org[man_t.body_b], orn_b[:, 0], state.angvel[man_t.body_b],
                rolling[man_t.body_b])
        return merge_points(man_t, new_pivot_a, new_pivot_b, local_n,
                            new_attach, new_dist, new_valid, pose=pose,
                            dt=dt, scales=new_scales)

    # merged per-point columns (everything _merge may rewrite)
    _MERGE_FIELDS = ("point_valid", "pivot_a", "pivot_b", "local_normal",
                     "normal_attachment", "distance", "lifetime",
                     "normal_impulse", "friction_impulse", "spin_impulse",
                     "roll_impulse", "friction_scale", "restitution_scale")

    # width ladder: merge only the ACTIVE pairs (cls >= 0 — awake and near).
    # A mostly-asleep world compacts them into an M/8 prefix and merges a
    # gathered slice (frozen pairs keep their points untouched — they are
    # slot-stable); wider worlds run the classic full-width merge.
    Ksmall = max(256, -(-(M // 8) // 256) * 256)
    act = cls >= 0

    def merge_full(_):
        # frozen (sleeping/static-static) pairs keep their points VERBATIM,
        # exactly like the small-width branch which never gathers them —
        # otherwise per-point lifetime/distance would depend on which ladder
        # branch the live count selected (ADVICE r4)
        merged = _merge(man, new_pts)
        fr = frozen & man.valid

        def keep_frozen(f):
            old, new = getattr(man, f), getattr(merged, f)
            m = fr.reshape(fr.shape + (1,) * (old.ndim - 1))
            return jnp.where(m, old, new)

        return dataclasses.replace(
            merged, **{f: keep_frozen(f) for f in _MERGE_FIELDS})

    def merge_small(_):
        sel, sel_ok, _d = _compact_sel(act, Ksmall, M)
        sel_c = jnp.minimum(sel, M - 1)
        man_k = dataclasses.replace(
            man,
            **{f: getattr(man, f)[sel_c] for f in _MERGE_FIELDS},
            body_a=man.body_a[sel_c], body_b=man.body_b[sel_c],
            valid=man.valid[sel_c] & sel_ok,
            key=man.key[sel_c])
        merged = _merge(man_k, new_pts[sel_c])
        sel_w = jnp.where(sel_ok, sel_c, M)
        return dataclasses.replace(
            man, **{f: getattr(man, f).at[sel_w].set(getattr(merged, f),
                                                     mode="drop")
                    for f in _MERGE_FIELDS})

    if Ksmall < M:
        man = jax.lax.cond(jnp.sum(act) <= Ksmall, merge_small, merge_full,
                           None)
    else:
        man = merge_full(None)
    return man, dropped
