"""Pallas TPU kernel: dense AABB-overlap pair counting.

Counts upper-triangular AABB overlaps tile-by-tile with the count accumulated
in SMEM across the sequential TPU grid — the building block for sizing the
pair budget (`suggest_max_pairs`) without materializing the [N,N] mask in HBM
(the XLA broadphase writes ~N^2/8 bytes; this kernel streams 2*TILE AABB rows
per step and writes 4 bytes).

Reference analogue: none — the reference's tree broadphase sizes nothing up
front; fixed-capacity TPU tables need this diagnostic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _kernel(amin_ref, amax_ref, count_ref, acc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc[0] = 0

    # only the upper-triangular tile region contributes
    @pl.when(j >= i)
    def _():
        # AABBs are padded to [N, 8] (min xyz, max xyz, valid flag, pad)
        a = amin_ref[...]            # [TILE, 8] rows for block i
        b = amax_ref[...]            # [TILE, 8] rows for block j
        ai_min = a[:, 0:3]
        ai_max = a[:, 3:6]
        ai_ok = a[:, 6] > 0.5
        bj_min = b[:, 0:3]
        bj_max = b[:, 3:6]
        bj_ok = b[:, 6] > 0.5

        o = jnp.ones((TILE, TILE), jnp.bool_)
        for d in range(3):
            o &= ai_min[:, d][:, None] <= bj_max[:, d][None, :]
            o &= ai_max[:, d][:, None] >= bj_min[:, d][None, :]
        o &= ai_ok[:, None] & bj_ok[None, :]
        # strict upper triangle in global indices
        gi = i * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        gj = j * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        o &= gi < gj
        acc[0] += jnp.sum(o.astype(jnp.int32))

    @pl.when((i == pl.num_programs(0) - 1) & (j == nj - 1))
    def _():
        count_ref[0] = acc[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def count_overlaps(aabb_min, aabb_max, valid, interpret: bool = False):
    """Number of overlapping valid AABB pairs (upper triangle)."""
    N = aabb_min.shape[0]
    pad = (-N) % TILE
    packed = jnp.concatenate([
        aabb_min, aabb_max,
        valid[:, None].astype(aabb_min.dtype),
        jnp.zeros((N, 1), aabb_min.dtype),
    ], axis=1)
    packed = jnp.pad(packed, ((0, pad), (0, 0)))
    nb = (N + pad) // TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, 8), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(packed, packed)[0]


def suggest_max_pairs(state, slack: float = 1.5, interpret: bool = False) -> int:
    """Measure the live pair count and suggest a padded budget."""
    n = int(count_overlaps(state.aabb_min, state.aabb_max, state.valid,
                           interpret=interpret))
    return max(256, int(n * slack))
