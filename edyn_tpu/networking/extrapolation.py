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

import math
from typing import Optional

from ..replication.snapshot import RegistrySnapshot, apply_snapshot
from ..simulation.stepper import physics_step

MAX_EXTRAPOLATION_STEPS = 20  # reference: execution time limit analogue


def extrapolate(world, snap: RegistrySnapshot, emap, snapshot_local_time: float,
                now: float, input_history=None,
                max_steps: int = MAX_EXTRAPOLATION_STEPS):
    """Returns (state, steps_done, timed_out): a scratch state advanced from
    the snapshot's time to ~now. The caller merges the result into the live
    world (process_extrapolation_result analogue)."""
    dt = world.settings.fixed_dt
    num_steps = max(0, int(math.floor((now - snapshot_local_time) / dt)))
    timed_out = num_steps > max_steps
    num_steps = min(num_steps, max_steps)

    state = apply_snapshot(world.state, snap, emap)
    t = snapshot_local_time
    for _ in range(num_steps):
        if input_history is not None:
            state = input_history.apply(state, t, dt)
        state = physics_step(state, world.settings, world.meta)
        t += dt
    return state, num_steps, timed_out
