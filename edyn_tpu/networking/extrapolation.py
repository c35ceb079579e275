"""Client-side extrapolation.

Reference: the extrapolation worker thread
(include/edyn/networking/extrapolation/extrapolation_worker.hpp:27-104,
src impl :291-542) owns a private registry and replays a snapshot forward
from packet time to the present, applying input history, under a time limit.

TPU-native reformulation (SURVEY §7.8): the "worker with its own registry" is
just another invocation of the SAME jitted step over a scratch copy of the
world pytree — no thread, no second engine. Inputs are replayed by writing
the input history's component snapshots between steps.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.state import KIND_STATIC
from ..replication.snapshot import RegistrySnapshot, apply_snapshot
from ..simulation.stepper import physics_step

MAX_EXTRAPOLATION_STEPS = 20  # reference: execution time limit analogue


def _freeze_outside_islands(world, state, snap, emap):
    """Freeze every dynamic body outside the snapshot entities' islands:
    they become static environment for the replay (reference: the
    extrapolation worker imports and steps only the snapshot's islands,
    extrapolation_worker.cpp:291; here the restriction is mask-based)."""
    if emap is None:
        local = np.asarray(snap.entities, np.int64)
    else:
        local = np.array(
            [emap.to_local(int(e)) if emap.has_remote(int(e)) else -1
             for e in snap.entities], np.int64)
        local = local[local >= 0]
    if len(local) == 0:
        return state
    # exact transitive membership (robust to the post-reset label
    # fragmentation window of compute_islands)
    from ..dynamics.islands import exact_island_mask
    members = np.asarray(exact_island_mask(world.state, local))
    keep = members | ~np.asarray(world.state.is_dynamic)
    keep_j = jnp.asarray(keep)
    return dataclasses.replace(
        state,
        kind=jnp.where(keep_j, state.kind, KIND_STATIC),
        mass_inv=jnp.where(keep_j, state.mass_inv, 0.0),
        inertia_inv=jnp.where(keep_j[:, None, None], state.inertia_inv, 0.0),
        linvel=jnp.where(keep_j[:, None], state.linvel, 0.0),
        angvel=jnp.where(keep_j[:, None], state.angvel, 0.0))


def extrapolate(world, snap: RegistrySnapshot, emap, snapshot_local_time: float,
                now: float, input_history=None,
                max_steps: int = MAX_EXTRAPOLATION_STEPS,
                islands_only: bool = True):
    """Returns (state, steps_done, timed_out): a scratch state advanced from
    the snapshot's time to ~now. The caller merges the result into the live
    world (process_extrapolation_result analogue). With ``islands_only`` the
    replay only simulates the snapshot's islands — everything else is frozen
    as static environment (10k-body worlds don't re-step for a 5-body
    snapshot)."""
    dt = world.settings.fixed_dt
    num_steps = max(0, int(math.floor((now - snapshot_local_time) / dt)))
    timed_out = num_steps > max_steps
    num_steps = min(num_steps, max_steps)

    state = apply_snapshot(world.state, snap, emap)
    if islands_only:
        state = _freeze_outside_islands(world, state, snap, emap)
    t = snapshot_local_time
    for _ in range(num_steps):
        if input_history is not None:
            state = input_history.apply(state, t, dt)
        state = physics_step(state, world.settings, world.meta)
        t += dt
    return state, num_steps, timed_out
