"""Dispatch-lean searching/compaction primitives.

``jnp.searchsorted`` lowers to a vmapped while-loop — ~log2(N) sequential
device dispatches of ~6 kernels each, which on a launch-overhead-bound
runtime costs tens of milliseconds for a search that moves kilobytes. The
k-ary unrolled search below does the same work in ceil(log_k(N)) + 1 fused
gather rounds (one gather of k-1 probes per round), each a single dispatch.

Used by broadphase pair compaction and manifold carry-over (the hot per-step
path); semantics match jnp.searchsorted exactly for sorted int/float input.
"""
from __future__ import annotations

import jax.numpy as jnp


def kary_searchsorted(arr, queries, side: str = "left", k: int = 8):
    """Insertion indices of ``queries`` into sorted 1-D ``arr``.

    Matches ``jnp.searchsorted(arr, queries, side=side)`` — the answer is the
    count of elements satisfying ``arr[t] < q`` (side="left") or
    ``arr[t] <= q`` (side="right").

    Each round probes k-1 evenly spaced elements with ONE gather and narrows
    the bracket by the number of satisfied probes (monotone, so the count is
    exact and never overshoots the true insertion point).
    """
    n = arr.shape[0]
    q = queries
    lo = jnp.zeros(q.shape, jnp.int32)
    if n == 0:
        return lo
    width = n
    le = side == "right"
    offs = jnp.arange(1, k, dtype=jnp.int32)  # [k-1]
    while width >= 1:
        step = -(-width // k)
        # element indices t_j = lo + j*step - 1, j = 1..k-1
        t = lo[..., None] + offs * jnp.int32(step) - 1   # [..., k-1]
        in_range = t < n
        vals = arr[jnp.minimum(t, n - 1)]
        hit = (vals <= q[..., None]) if le else (vals < q[..., None])
        cnt = jnp.sum(hit & in_range, axis=-1).astype(jnp.int32)
        lo = lo + cnt * step
        if width == 1:
            break
        width = step
    return lo
