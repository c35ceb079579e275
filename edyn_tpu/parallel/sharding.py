"""Multi-chip sharding of the world step over a jax.sharding.Mesh.

The reference scales with threads inside one host (islands fan out to worker
jobs, SURVEY §5.7); the TPU build scales over chips instead: body/contact/
joint tables are sharded along their leading (entity/pair) axis across the
mesh's "b" axis, the step function is jitted with those shardings, and GSPMD
inserts the ICI collectives for the cross-shard gathers (contact rows reading
both bodies of a pair) and scatter-adds (delta-velocity accumulation) — the
device-mesh analogue of edyn's planned-but-absent multi-server clustering
(Design.md:451-457).
"""
from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..simulation.stepper import physics_step_impl

BODY_AXIS = "b"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (BODY_AXIS,))


def state_shardings(mesh: Mesh, state):
    """Shard every table along its leading axis when divisible by the mesh
    size; replicate the rest (scalars, small side tables)."""
    n = mesh.size

    def spec(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] >= n and leaf.shape[0] % n == 0:
            return NamedSharding(mesh, P(BODY_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, state)


def make_sharded_step(mesh: Mesh, state, settings, meta):
    """Returns (step_fn, device_state): step_fn(state) -> state runs the full
    physics step sharded over the mesh. Row-space intermediates are pinned to
    the body axis via meta.shard_mesh (see stepper._shard_rows) so GSPMD
    emits body-space collectives instead of row-space all-reduces."""
    import dataclasses
    meta = dataclasses.replace(meta, shard_mesh=(mesh, BODY_AXIS))
    sh = state_shardings(mesh, state)
    step = jax.jit(
        functools.partial(physics_step_impl, settings=settings, meta=meta),
        in_shardings=(sh,), out_shardings=sh)
    device_state = jax.device_put(state, sh)
    return step, device_state
