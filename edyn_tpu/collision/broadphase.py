"""Broadphase: batched AABB overlap -> padded, sorted candidate pair list.

TPU-native replacement for the reference's dynamic-AABB-tree broadphase
(include/edyn/collision/dynamic_tree.hpp:24-104,
src/edyn/collision/broadphase.cpp:177-232). Instead of an incrementally
rebalanced BVH + per-entity tree queries, the dense upper-triangular overlap
mask is evaluated in ONE shot (the AABB table for 10k bodies is ~320 KB and
the [N,N] mask ~100 MB — bandwidth-trivial on the VPU, and one fused op chain
beats any tree walk's launch overhead) and compacted to a fixed-capacity pair
list with a single sort. Worlds above DENSE_LIMIT fall back to row blocks.
The sorted pair keys double as the manifold-persistence index (replaces
contact_manifold_map).

Filters follow should_collide_default (src/edyn/collision/should_collide.cpp:23-50):
self, unallocated slots, two non-dynamic bodies, collision group/mask,
exclusion lists, amorphous bodies.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..shapes.params import ShapeType
from ..core.state import KIND_DYNAMIC

# Pair keys are uint32 (a * N + b, a < b). uint32 covers N <= 65536 without
# collision with INVALID_KEY (max real key at N=65536 is 65534*65536+65535
# < 2^32-1); int32 overflowed at N > 46340. int64 is not an option under
# JAX's default x64-disabled config (it silently truncates).
INVALID_KEY = np.uint32(np.iinfo(np.uint32).max)  # host scalar: importing must not init a backend
MAX_BODIES_FOR_KEYS = 65536
DENSE_LIMIT = MAX_BODIES_FOR_KEYS  # the dense mask path now covers the
# whole uint32-key range: the narrow-narrow mask is box-only elementwise
# VPU work (~N^2 bool ops, bitpacked to N^2/32 bytes), wide bodies
# (planes/terrain) live in a [N, wide_cap] side block, and extraction is
# arithmetic per-row bit search. The sweep path remains available via
# SceneMeta.broadphase_mode="sweep" but its fixed window can truncate real
# pairs in dense piles (the r3 16k wake storm), so it is no longer the
# default anywhere.


def _pack_keys(a, b, N, ok):
    """uint32 pair key a*N+b where ok, else INVALID_KEY."""
    k = a.astype(jnp.uint32) * jnp.uint32(N) + b.astype(jnp.uint32)
    return jnp.where(ok, k, INVALID_KEY)


def _compact(flat_mask, size: int):
    """Indices of set bits, ascending, padded with -1 — via exclusive cumsum
    + dropped scatter (jnp.nonzero's sort-based lowering is O(L log L) on a
    1e8-element mask; this is O(L))."""
    L = flat_mask.shape[0]
    pos = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
    write = jnp.where(flat_mask, pos, size)
    out = jnp.full((size,), -1, jnp.int32)
    src = jnp.arange(L, dtype=jnp.int32)
    out = out.at[write].set(src, mode="drop")
    count = jnp.sum(flat_mask)
    return out, count


def _pair_filters_elt(state, i, j):
    """Eligibility mask for elementwise index arrays (broadcastable i vs j):
    should_collide_default minus exclusions (applied post-compaction)."""
    valid = state.valid & (state.shape_type != ShapeType.NONE)
    dyn = state.kind == KIND_DYNAMIC
    m = valid[i] & valid[j]
    m &= i != j
    # at least one dynamic (procedural) body
    m &= dyn[i] | dyn[j]
    # collision group/mask both ways
    m &= ((state.group[i] & state.mask[j]) != 0) \
        & ((state.group[j] & state.mask[i]) != 0)
    return m


PLANE_PAIR_MARGIN = 0.05  # halfspace pairing slack (> collision_threshold
                          # so speculative contacts + hysteresis survive)


def _overlap_boxes(state, i, j):
    # pair generation reads the ADMISSION boxes (state.bp_aabb_*): the tight
    # AABB swept by one step of velocity and inflated by the separation
    # margin (stepper.physics_step_impl; reference: broadphase.hpp:15-18
    # offset-AABB queries). Sleeping bodies have zero velocity and frozen
    # positions, so their boxes — and the pair set — are exactly stable.
    # Unseated slots hold reversed bounds and overlap nothing.
    amin, amax = state.bp_aabb_min, state.bp_aabb_max
    o = jnp.all(amin[i] <= amax[j], axis=-1)
    o &= jnp.all(amax[i] >= amin[j], axis=-1)
    return o


def _overlap_elt(state, i, j):
    amin, amax = state.bp_aabb_min, state.bp_aabb_max
    o = _overlap_boxes(state, i, j)

    # plane bodies get a world-sized slab AABB (shapes/aabb.py PLANE_EXTENT),
    # which would pair them with EVERY body. Replace that test with the exact
    # AABB-vs-halfspace predicate: nearest-corner distance along the normal
    # (reference analogue: planes live in the non-procedural tree and
    # narrowphase rejects by distance; here the reject moves into broadphase
    # so far-away bodies never occupy manifold slots).
    def plane_clip(o, p, other):
        from ..math import quat
        is_p = state.shape_type[p] == ShapeType.PLANE
        prm = state.shape_params[p]
        # world-space halfspace, matching the narrowphase
        # (kernels/plane_unified.py:27-28): n_w = R * n_obj,
        # c_w = c_obj + n_w . origin_pos
        n = quat.rotate(state.orn[p], prm[..., 0:3])
        opos = state.pos[p] - quat.rotate(state.orn[p], state.com[p])
        c = prm[..., 3] + jnp.sum(n * opos, -1)
        lo = jnp.sum(jnp.minimum(amin[other] * n, amax[other] * n), -1)
        return o & (~is_p | (lo <= c + PLANE_PAIR_MARGIN))

    o = plane_clip(o, i, j)
    o = plane_clip(o, j, i)
    return o


def _pair_filters(state, i_idx, j_idx):
    """Grid [I,J] eligibility (dense path): elementwise filters + strict
    upper-triangular dedupe."""
    m = _pair_filters_elt(state, i_idx[:, None], j_idx[None, :])
    m &= i_idx[:, None] < j_idx[None, :]
    return m


def _overlap(state, i_idx, j_idx):
    return _overlap_elt(state, i_idx[:, None], j_idx[None, :])


@functools.partial(jax.jit, static_argnames=("max_pairs", "window",
                                             "wide_cap", "should_collide_fn"))
def find_pairs_sweep(state, max_pairs: int, window: int = 128,
                     wide_cap: int = 64, should_collide_fn=None):
    """Sort-and-sweep broadphase (reference analogue: the dynamic AABB tree,
    collision/dynamic_tree.hpp — reformulated as one sort + windowed
    neighbor scan, the TPU-friendly sweep-and-prune).

    Bodies are sorted by AABB min along the highest-variance axis (chosen
    per step, data-dependently — no re-trace); each body tests the next
    ``window`` bodies in sweep order. Bodies whose axis extent spans a large
    fraction of the world ("wide": planes, terrain meshes) would overlap
    everything in sweep order, so up to ``wide_cap`` of them are handled as
    dense rows against all bodies instead. O(N log N + N*window + wide*N)
    work and memory vs the dense path's O(N^2) — the 50k+ scalability story.

    Returns (keys sorted asc, body_a, body_b, valid, dropped) exactly like
    the dense path; `dropped` also counts conservative beyond-window alarms.
    """
    N = state.capacity
    assert N <= MAX_BODIES_FOR_KEYS, \
        f"pair keys are uint32: capacity {N} > {MAX_BODIES_FOR_KEYS}"
    W = min(window, max(N - 1, 1))
    idx = jnp.arange(N)
    # sweep order/windows use the carried fat boxes too (consistent with
    # _overlap_elt), so the sweep's pair set is jitter-stable as well
    amin, amax = state.bp_aabb_min, state.bp_aabb_max
    valid = state.valid & (state.shape_type != ShapeType.NONE)

    # axis: largest variance of AABB centers over valid bodies
    cen = 0.5 * (amin + amax)
    nv = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], cen, 0.0), 0) / nv
    var = jnp.sum(jnp.where(valid[:, None], (cen - mean) ** 2, 0.0), 0)
    oh = (jnp.arange(3) == jnp.argmax(var)).astype(amin.dtype)
    smin = amin @ oh
    smax = amax @ oh

    # wide bodies: axis extent over a fraction of the world span
    lo_w = jnp.min(jnp.where(valid, smin, jnp.inf))
    hi_w = jnp.max(jnp.where(valid, smax, -jnp.inf))
    span = jnp.maximum(hi_w - lo_w, 1e-6)
    wide = valid & ((smax - smin) > 0.25 * span)
    narrow = valid & ~wide

    skey = jnp.where(narrow, smin, jnp.inf)
    order = jnp.argsort(skey).astype(jnp.int32)
    os_min = skey[order]
    os_max = jnp.where(narrow[order], smax[order], -jnp.inf)

    # windowed neighbor scan in sweep order
    koff = jnp.arange(1, W + 1, dtype=jnp.int32)
    nbr = idx[:, None] + koff[None, :]                    # [N,W]
    in_rng = nbr < N
    nbr_c = jnp.minimum(nbr, N - 1)
    i2 = jnp.broadcast_to(order[:, None], (N, W))
    j2 = order[nbr_c]
    m = in_rng & (os_min[nbr_c] <= os_max[:, None])
    m &= _pair_filters_elt(state, i2, j2)
    m &= _overlap_elt(state, i2, j2)
    if should_collide_fn is not None:
        m &= should_collide_fn(state, i2, j2)

    # conservative beyond-window ALARM (axis-overlap continues past the
    # window). This can fire without any real missed pair (e.g. bodies
    # stacked along the sweep axis during free fall), so it is reported
    # SEPARATELY from definite drops — treat a persistent non-zero alarm as
    # "consider raising SceneMeta.sweep_window".
    beyond = jnp.minimum(idx + W + 1, N - 1)
    alarms = jnp.sum((os_min[beyond] <= os_max) & (idx + W + 1 < N))

    # wide rows: dense against all bodies; dedupe wide-wide by index order
    wloc, wcnt = _compact(wide, wide_cap)
    wi = jnp.where(wloc >= 0, wloc, 0)
    iw = jnp.broadcast_to(wi[:, None], (wide_cap, N))
    jw = jnp.broadcast_to(idx[None, :], (wide_cap, N))
    mw = (wloc >= 0)[:, None] & _pair_filters_elt(state, iw, jw)
    mw &= _overlap_elt(state, iw, jw)
    mw &= ~wide[jw] | (jw > iw)
    if should_collide_fn is not None:
        mw &= should_collide_fn(state, iw, jw)

    # compact both mask blocks into the pair list
    flat = jnp.concatenate([m.reshape(-1), mw.reshape(-1)])
    loc, count = _compact(flat, max_pairs)
    ok = loc >= 0
    is_n = loc < N * W
    ln = jnp.clip(loc, 0, N * W - 1)
    a_n = order[ln // W]
    j_off = jnp.minimum(ln // W + 1 + ln % W, N - 1)
    b_n = order[j_off]
    lw = jnp.clip(loc - N * W, 0, wide_cap * N - 1)
    a_w = wi[lw // N]
    b_w = lw % N
    a_ = jnp.where(is_n, a_n, a_w)
    b_ = jnp.where(is_n, b_n, b_w)
    lo_ab = jnp.minimum(a_, b_)
    hi_ab = jnp.maximum(a_, b_)
    keys = jnp.sort(_pack_keys(lo_ab, hi_ab, N, ok))

    valid_k = keys != INVALID_KEY
    body_a = jnp.where(valid_k, keys // N, 0).astype(jnp.int32)
    body_b = jnp.where(valid_k, keys % N, 0).astype(jnp.int32)
    ex_a = state.exclusions[body_a]
    excluded = jnp.any(ex_a == body_b[:, None], axis=-1)
    valid_k &= ~excluded
    dropped = (jnp.maximum(count - max_pairs, 0)
               + jnp.maximum(wcnt - wide_cap, 0))
    return keys, body_a, body_b, valid_k, dropped, alarms


@functools.partial(jax.jit, static_argnames=("max_pairs", "block",
                                             "should_collide_fn",
                                             "dense_row_cap", "wide_cap"))
def find_pairs(state, max_pairs: int, block: int = 256,
               should_collide_fn=None, dense_row_cap: int = 28,
               wide_cap: int = 64):
    """Returns (keys[max_pairs] sorted asc, body_a, body_b, valid, dropped).

    keys = a * N + b with a < b; INVALID_KEY marks padding."""
    N = state.capacity
    assert N <= MAX_BODIES_FOR_KEYS, \
        f"pair keys are uint32: capacity {N} > {MAX_BODIES_FOR_KEYS}"
    idx = jnp.arange(N)

    if N <= DENSE_LIMIT:
        # one-shot dense path: a single fused mask, then PER-ROW bit
        # extraction. The measured cost law of this runtime is ~6 ns per
        # gathered index, so the old design (k-ary searchsorted over chunk
        # offsets + a [P,128] chunk-row gather: ~20 gathered indices per
        # output slot) paid ~25 ms at 10k; this one extracts the k-th set
        # bit of each row arithmetically (bitpack -> popcount prefix ->
        # broadcast compares, zero gathers) and pays one index-scatter in
        # the final compaction plus one flat-rate key sort (~2.5 ms).
        #
        # Row budget: a body's row holds its pairs with higher-indexed
        # narrow bodies PLUS all its pairs with "wide" bodies (planes,
        # terrain — world-spanning AABBs that would blow any per-row cap),
        # so wide bodies never own a row and `dense_row_cap` stays small.
        # The narrow-narrow mask is BOX-ONLY elementwise work (the exact
        # plane-vs-AABB clip runs only in the [N, wide_cap] wide block —
        # at 50k bodies the clip's [N,N,3] intermediates would be ~7 GB).
        # Emission order is not key-sorted, hence the flat-rate sort.
        CH = 32
        Bc_n = -(-N // 128) * 4                 # u32 chunks, 128-lane padded
        Np = Bc_n * CH
        idx_c = jnp.minimum(jnp.arange(Np), N - 1)
        in_n = (jnp.arange(Np) < N)

        # wide: any-axis extent over a quarter of the world span on that axis
        amin, amax = state.bp_aabb_min, state.bp_aabb_max
        validb = state.valid & (state.shape_type != ShapeType.NONE)
        lo_w = jnp.min(jnp.where(validb[:, None], amin, jnp.inf), axis=0)
        hi_w = jnp.max(jnp.where(validb[:, None], amax, -jnp.inf), axis=0)
        span = jnp.maximum(hi_w - lo_w, 1e-6)
        wide = validb & jnp.any((amax - amin) > 0.25 * span[None, :], axis=-1)
        narrow = validb & ~wide

        m = _pair_filters_elt(state, idx[:, None], idx_c[None, :])
        m &= in_n[None, :]
        m &= narrow[:, None] & narrow[idx_c][None, :]
        m &= idx[:, None] < idx_c[None, :]
        if should_collide_fn is not None:
            m &= should_collide_fn(state, idx[:, None], idx_c[None, :])
        m &= _overlap_boxes(state, idx[:, None], idx_c[None, :])

        # wide block [N, wide_cap]: narrow-vs-wide (every such pair lives in
        # the narrow row) + wide-vs-wide (lower-indexed row), with the FULL
        # overlap test including the plane clip
        wloc, wcnt = _compact(wide, wide_cap)
        wj_ids = jnp.where(wloc >= 0, wloc, 0)
        iw = idx[:, None]
        jw = wj_ids[None, :]
        mw = (wloc >= 0)[None, :] & _pair_filters_elt(state, iw, jw)
        mw &= narrow[:, None] | (wide[:, None] & (iw < jw))
        if should_collide_fn is not None:
            mw &= should_collide_fn(state, iw, jw)
        mw &= _overlap_elt(state, iw, jw)

        Wc = wide_cap
        Bc_w = -(-Wc // CH)
        Wpad = Bc_w * CH
        mw = jnp.pad(mw, ((0, 0), (0, Wpad - Wc)))
        Bc = Bc_n + Bc_w

        # bitpack each row into u32 chunks (narrow columns, then wide)
        pw = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        pack = lambda x, B: jnp.sum(x.reshape(N, B, CH).astype(jnp.uint32)
                                    * pw[None, None, :], axis=-1)
        chunks = jnp.concatenate([pack(m, Bc_n), pack(mw, Bc_w)],
                                 axis=1)                        # [N,Bc] u32
        ccnt = jax.lax.population_count(chunks).astype(jnp.int32)
        rowcnt = jnp.sum(ccnt, axis=1)                          # [N]
        exc = jnp.cumsum(ccnt, axis=1) - ccnt                   # [N,Bc] excl
        C = dense_row_cap
        c_ids = jnp.arange(C, dtype=jnp.int32)                  # [C]
        # chunk holding the c-th set bit of the row: exc<=c<exc+cnt
        hit = ((exc[:, None, :] <= c_ids[None, :, None])
               & (c_ids[None, :, None] < (exc + ccnt)[:, None, :]))  # [N,C,Bc]
        hitf = hit.astype(jnp.uint32)
        b_sel = jnp.sum(hitf * jnp.arange(Bc, dtype=jnp.uint32)[None, None, :],
                        -1)
        v_sel = jnp.sum(hitf * chunks[:, None, :], -1)          # [N,C] u32
        r_sel = c_ids[None, :] - jnp.sum(
            hitf * exc.astype(jnp.uint32)[:, None, :], -1).astype(jnp.int32)
        # r-th set bit of v via prefix popcounts (arithmetic, no gather)
        bit_ids = jnp.arange(32, dtype=jnp.uint32)
        below = jax.lax.population_count(
            v_sel[:, :, None] & ((jnp.uint32(1) << bit_ids) - jnp.uint32(1))
            [None, None, :]).astype(jnp.int32)
        bit_hit = ((((v_sel[:, :, None] >> bit_ids[None, None, :])
                     & jnp.uint32(1)) == 1) & (below == r_sel[:, :, None]))
        bitpos = jnp.sum(bit_hit * jnp.arange(32, dtype=jnp.int32)
                         [None, None, :], -1)
        col = b_sel.astype(jnp.int32) * CH + bitpos             # [N,C]
        # decode: narrow columns are body ids; wide columns index the
        # compacted wide list (selected arithmetically — wide_cap is small)
        wcol = col - Np
        j_wide = jnp.sum(jnp.where(
            wcol[:, :, None] == jnp.arange(Wc, dtype=jnp.int32)[None, None, :],
            wj_ids[None, None, :], 0), -1)
        j_cand = jnp.where(col < Np, col, j_wide)               # [N,C]
        valid_c = c_ids[None, :] < jnp.minimum(rowcnt, C)[:, None]

        flat_v = valid_c.reshape(-1)
        loc, total = _compact(flat_v, max_pairs)
        ok = loc >= 0
        locc = jnp.clip(loc, 0, N * C - 1)
        i_row = locc // C
        j_col = jnp.minimum(j_cand.reshape(-1)[locc], N - 1)
        lo_ab = jnp.minimum(i_row, j_col)
        hi_ab = jnp.maximum(i_row, j_col)
        keys = jnp.sort(_pack_keys(lo_ab, hi_ab, N, ok))
        dropped = (jnp.maximum(total - max_pairs, 0)
                   + jnp.sum(jnp.maximum(rowcnt - C, 0))
                   + jnp.maximum(wcnt - wide_cap, 0))
    else:
        n_blocks = -(-N // block)
        kb = min(max(256, (max_pairs // n_blocks) * 4), block * N)

        def do_block(i0):
            i_idx = i0 + jnp.arange(block)
            i_c = jnp.minimum(i_idx, N - 1)
            m = _pair_filters(state, i_c, idx)
            if should_collide_fn is not None:
                m &= should_collide_fn(state, i_c[:, None], idx[None, :])
            m &= i_idx[:, None] < N
            m &= _overlap(state, i_c, idx)
            flat = m.reshape(-1)
            loc, count = _compact(flat, kb)
            ii = i_c[loc // N]
            jj = loc % N
            k = _pack_keys(ii, jj, N, loc >= 0)
            return k, jnp.maximum(count - kb, 0)

        starts = jnp.arange(n_blocks) * block
        keys_blocks, dropped_blocks = jax.lax.map(do_block, starts)
        all_keys = jnp.sort(keys_blocks.reshape(-1))
        keys = all_keys[:max_pairs]
        total = jnp.sum(all_keys != INVALID_KEY)
        dropped = jnp.sum(dropped_blocks) + jnp.maximum(total - max_pairs, 0)

    valid = keys != INVALID_KEY
    body_a = jnp.where(valid, keys // N, 0).astype(jnp.int32)
    body_b = jnp.where(valid, keys % N, 0).astype(jnp.int32)
    # exclusion lists (reference comp/collision_exclusion.hpp), post-compaction:
    # max_pairs x 16 compares instead of N^2 x 16
    ex_a = state.exclusions[body_a]               # [P,E]
    excluded = jnp.any(ex_a == body_b[:, None], axis=-1)
    valid &= ~excluded
    return keys, body_a, body_b, valid, dropped
