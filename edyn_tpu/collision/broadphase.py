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

INVALID_KEY = jnp.iinfo(jnp.int32).max
DENSE_LIMIT = 12_000  # N above which the blocked path kicks in


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


def _pair_filters(state, i_idx, j_idx):
    """Boolean mask of eligible pairs for row indices i vs columns j."""
    kind = state.kind
    valid = state.valid & (state.shape_type != ShapeType.NONE)
    dyn = kind == KIND_DYNAMIC

    m = valid[i_idx][:, None] & valid[j_idx][None, :]
    # strictly upper-triangular: one pair per unordered pair
    m &= i_idx[:, None] < j_idx[None, :]
    # at least one dynamic (procedural) body
    m &= dyn[i_idx][:, None] | dyn[j_idx][None, :]
    # collision group/mask both ways
    gi, mi = state.group[i_idx][:, None], state.mask[i_idx][:, None]
    gj, mj = state.group[j_idx][None, :], state.mask[j_idx][None, :]
    m &= ((gi & mj) != 0) & ((gj & mi) != 0)
    # NOTE: exclusion lists are applied AFTER compaction (checking them inside
    # the dense mask would cost an [N,N,16] compare — ~1.6e9 elements at 10k
    # bodies); see find_pairs.
    return m


def _overlap(state, i_idx, j_idx):
    amin, amax = state.aabb_min, state.aabb_max
    o = jnp.all(amin[i_idx][:, None, :] <= amax[j_idx][None, :, :], axis=-1)
    o &= jnp.all(amax[i_idx][:, None, :] >= amin[j_idx][None, :, :], axis=-1)
    return o


@functools.partial(jax.jit, static_argnames=("max_pairs", "block",
                                             "should_collide_fn"))
def find_pairs(state, max_pairs: int, block: int = 256,
               should_collide_fn=None):
    """Returns (keys[max_pairs] sorted asc, body_a, body_b, valid, dropped).

    keys = a * N + b with a < b; INVALID_KEY marks padding."""
    N = state.capacity
    idx = jnp.arange(N)

    if N <= DENSE_LIMIT:
        # one-shot dense path: a single fused mask, then GATHER-based
        # compaction — a flat scatter/cumsum over the N^2 mask would process
        # 1e8 scatter updates (the dominant cost at 10k bodies); instead we
        # take row counts + a per-row running count and binary-search each of
        # the max_pairs output slots to its (row, column) with ~14 cheap
        # gather rounds.
        m = _pair_filters(state, idx, idx)
        if should_collide_fn is not None:
            m &= should_collide_fn(state, idx, idx)
        m &= _overlap(state, idx, idx)

        row_cum = jnp.cumsum(m.astype(jnp.int32), axis=1)     # [N,N] inclusive
        row_counts = row_cum[:, -1]                           # [N]
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(row_counts)])   # [N+1]
        total = offsets[-1]

        from ..ops.search import kary_searchsorted
        k = jnp.arange(max_pairs, dtype=jnp.int32)
        in_range = k < total
        i_row = kary_searchsorted(offsets, k, side="right") - 1
        i_row = jnp.clip(i_row, 0, N - 1)
        rank = k - offsets[i_row] + 1                          # 1-based in row

        # k-ary search the first column with row_cum[i, j] >= rank (one
        # [max_pairs, K-1] gather per round instead of one per binary probe)
        KARY = 8
        offs = jnp.arange(1, KARY, dtype=jnp.int32)
        lo = jnp.zeros_like(k)
        width = N
        while width >= 1:
            step = -(-width // KARY)
            t = lo[:, None] + offs * jnp.int32(step) - 1
            ok = t < N
            vals = row_cum[i_row[:, None], jnp.minimum(t, N - 1)]
            cnt = jnp.sum((vals < rank[:, None]) & ok, axis=-1).astype(jnp.int32)
            lo = lo + cnt * step
            if width == 1:
                break
            width = step
        j_col = jnp.clip(lo, 0, N - 1)

        keys = jnp.where(in_range, i_row * N + j_col,
                         INVALID_KEY).astype(jnp.int32)
        dropped = jnp.maximum(total - max_pairs, 0)
    else:
        n_blocks = -(-N // block)
        kb = min(max(256, (max_pairs // n_blocks) * 4), block * N)

        def do_block(i0):
            i_idx = i0 + jnp.arange(block)
            i_c = jnp.minimum(i_idx, N - 1)
            m = _pair_filters(state, i_c, idx)
            if should_collide_fn is not None:
                m &= should_collide_fn(state, i_c, idx)
            m &= i_idx[:, None] < N
            m &= _overlap(state, i_c, idx)
            flat = m.reshape(-1)
            loc, count = _compact(flat, kb)
            ii = i_c[loc // N]
            jj = loc % N
            k = jnp.where(loc >= 0, ii * N + jj, INVALID_KEY).astype(jnp.int32)
            return k, jnp.maximum(count - kb, 0)

        starts = jnp.arange(n_blocks) * block
        keys_blocks, dropped_blocks = jax.lax.map(do_block, starts)
        all_keys = jnp.sort(keys_blocks.reshape(-1))
        keys = all_keys[:max_pairs]
        total = jnp.sum(all_keys != INVALID_KEY)
        dropped = jnp.sum(dropped_blocks) + jnp.maximum(total - max_pairs, 0)

    valid = keys != INVALID_KEY
    body_a = jnp.where(valid, keys // N, 0)
    body_b = jnp.where(valid, keys % N, 0)
    # exclusion lists (reference comp/collision_exclusion.hpp), post-compaction:
    # max_pairs x 16 compares instead of N^2 x 16
    ex_a = state.exclusions[body_a]               # [P,E]
    excluded = jnp.any(ex_a == body_b[:, None], axis=-1)
    valid &= ~excluded
    return keys, body_a, body_b, valid, dropped
