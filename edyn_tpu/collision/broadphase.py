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

    # wide bodies: planes always (their PLANE_EXTENT slab AABBs would both
    # inflate the span estimate ~2e6 — misclassifying genuinely large
    # statics as narrow and truncating their windows, ADVICE r4 — and
    # overlap the whole sweep order), plus anything whose axis extent
    # covers a large fraction of the non-plane world span.
    is_plane = state.shape_type == ShapeType.PLANE
    span_b = valid & ~is_plane
    lo_w = jnp.min(jnp.where(span_b, smin, jnp.inf))
    hi_w = jnp.max(jnp.where(span_b, smax, -jnp.inf))
    span = jnp.maximum(hi_w - lo_w, 1e-6)
    wide = valid & (is_plane | ((smax - smin) > 0.25 * span))
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
                                             "wide_cap"))
def find_pairs(state, max_pairs: int, block: int = 256,
               should_collide_fn=None, wide_cap: int = 64):
    """Returns (keys[max_pairs] sorted asc, body_a, body_b, valid, dropped).

    keys = a * N + b with a < b; INVALID_KEY marks padding."""
    N = state.capacity
    assert N <= MAX_BODIES_FOR_KEYS, \
        f"pair keys are uint32: capacity {N} > {MAX_BODIES_FOR_KEYS}"
    idx = jnp.arange(N)

    if N <= DENSE_LIMIT:
        # one-shot dense path: a single fused mask, bitpacked to u32 chunks,
        # then CHUNK-SCATTER extraction — every set bit computes its own
        # output position (global exclusive cumsum of per-chunk popcounts +
        # in-chunk prefix popcount, all arithmetic) and a single scatter
        # emits the (row, col) pairs. There is NO per-row cap: r4's k-th-
        # set-bit extraction bounded each row at dense_row_cap=28 and
        # silently dropped ~5.5k real pairs/step on the settled 10k pile
        # (row occupancy max 72); its [N, C, Bc] hit intermediates were
        # also the 16k compile/memory cliff. Here the only bound is the
        # TOTAL max_pairs budget (counted + grown by World.auto_grow), and
        # the largest intermediate beyond the [N, Np] mask itself is the
        # [K, 32] bit expansion (K <= max_pairs nonzero chunks).
        #
        # The reference's tree query never drops an overlapping pair
        # (include/edyn/collision/dynamic_tree.hpp:24-104,
        # src/edyn/collision/broadphase.cpp:136-155); neither does this.
        CH = 32
        Bc_n = -(-N // 128) * 4                 # u32 chunks, 128-lane padded
        Np = Bc_n * CH
        idx_c = jnp.minimum(jnp.arange(Np), N - 1)
        in_n = (jnp.arange(Np) < N)

        # "wide" = plane bodies ONLY. Planes carry world-sized slab AABBs
        # (shapes/aabb.py PLANE_EXTENT) whose box test passes against every
        # body, so they live in a dedicated [N, wide_cap] block where the
        # EXACT AABB-vs-halfspace clip prunes them. Everything else —
        # terrain meshes, big platforms — has a real AABB and sits fine in
        # the narrow mask now that extraction has no per-row cap (r4's
        # span-relative extent classification misclassified large statics
        # whenever a plane inflated the span, ADVICE r4, and flipped
        # frame-to-frame as the world span breathed).
        validb = state.valid & (state.shape_type != ShapeType.NONE)
        wide = validb & (state.shape_type == ShapeType.PLANE)
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
        # overlap test including the plane clip (the exact plane-vs-AABB
        # predicate runs only here — on [N, N] it would materialize
        # [N, N, 3] intermediates)
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
                                 axis=1).reshape(-1)            # [N*Bc] u32
        ccnt = jax.lax.population_count(chunks).astype(jnp.int32)
        base = jnp.cumsum(ccnt) - ccnt                  # [N*Bc] excl prefix
        total = base[-1] + ccnt[-1]                     # total set bits

        # compact the nonzero chunks (each holds >= 1 bit, so max_pairs
        # slots suffice whenever the total budget does)
        loc, nzcnt = _compact(ccnt > 0, max_pairs)
        okc = loc >= 0
        locc = jnp.clip(loc, 0, N * Bc - 1)
        ch_v = jnp.where(okc, chunks[locc], 0)          # [K] u32
        ch_base = base[locc]                            # [K]
        ch_row = (locc // Bc).astype(jnp.int32)
        ch_col0 = (locc % Bc).astype(jnp.int32) * CH

        # expand each chunk's bits; every set bit's output slot is
        # chunk base + its in-chunk rank (prefix popcount)
        bit = jnp.arange(CH, dtype=jnp.uint32)
        isset = ((ch_v[:, None] >> bit[None, :]) & jnp.uint32(1)) == 1
        rank = jax.lax.population_count(
            ch_v[:, None] & ((jnp.uint32(1) << bit) - jnp.uint32(1))
            [None, :]).astype(jnp.int32)                # [K,CH]
        outpos = jnp.where(isset, ch_base[:, None] + rank, max_pairs)
        col = ch_col0[:, None] + jnp.arange(CH, dtype=jnp.int32)  # [K,CH]
        rc = jnp.stack([jnp.broadcast_to(ch_row[:, None], col.shape), col],
                       axis=-1)                         # [K,CH,2]
        pairs_rc = jnp.full((max_pairs + 1, 2), -1, jnp.int32).at[
            outpos.reshape(-1)].set(rc.reshape(-1, 2), mode="drop")[:-1]

        # decode columns: narrow columns are body ids; wide columns index
        # the compacted wide list (ONE [max_pairs] gather, post-compaction)
        i_row = pairs_rc[:, 0]
        colv = pairs_rc[:, 1]
        ok = i_row >= 0
        j_col = jnp.where(colv < Np, jnp.clip(colv, 0, N - 1),
                          wj_ids[jnp.clip(colv - Np, 0, Wc - 1)])
        lo_ab = jnp.minimum(i_row, j_col)
        hi_ab = jnp.maximum(i_row, j_col)
        keys = jnp.sort(_pack_keys(lo_ab, hi_ab, N, ok))
        # chunks beyond the nonzero-chunk budget can only exist when the
        # total budget is already blown (every nonzero chunk holds >= 1
        # bit), so max(total - max_pairs) subsumes them
        dropped = (jnp.maximum(total - max_pairs, 0)
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
