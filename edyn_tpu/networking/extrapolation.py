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
                islands_only: bool = True,
                time_limit: Optional[float] = None,
                action_history=None, action_handler=None):
    """Returns (state, steps_done, timed_out): a scratch state advanced from
    the snapshot's time to ~now. The caller merges the result into the live
    world (process_extrapolation_result analogue). With ``islands_only`` the
    replay only simulates the snapshot's islands — everything else is frozen
    as static environment (10k-body worlds don't re-step for a 5-body
    snapshot).

    ``time_limit`` bounds the replay by WALL CLOCK like the reference's
    execution time limit (extrapolation_worker.cpp:475-480) — checked after
    every completed device step; on expiry the replay stops where it is and
    ``timed_out`` is True."""
    import time as _time
    import jax as _jax
    dt = world.settings.fixed_dt
    num_steps = max(0, int(math.floor((now - snapshot_local_time) / dt)))
    timed_out = num_steps > max_steps
    num_steps = min(num_steps, max_steps)

    state = apply_snapshot(world.state, snap, emap)
    if islands_only:
        state = _freeze_outside_islands(world, state, snap, emap)
    t = snapshot_local_time
    t_start = _time.perf_counter()
    steps_done = 0
    for _ in range(num_steps):
        if input_history is not None:
            state = input_history.apply(state, t, dt)
        if action_history is not None and action_handler is not None:
            # replay discrete actions at their recorded times (reference:
            # the extrapolation worker re-executes action_history)
            state = action_history.apply(state, t, dt, action_handler)
        state = physics_step(state, world.settings, world.meta)
        t += dt
        steps_done += 1
        if time_limit is not None:
            _jax.block_until_ready(state.pos)
            if _time.perf_counter() - t_start > time_limit:
                timed_out = timed_out or steps_done < num_steps
                break
    return state, steps_done, timed_out


class ExtrapolationWorker:
    """Dedicated extrapolation thread (reference: extrapolation_worker.hpp:27-104
    — its own registry + message-driven replay off the main thread).

    Requests are LATEST-WINS (a newer server snapshot obsoletes a pending
    replay, matching the reference's republishing behavior); results are
    polled by the client on its next update. The replay runs under the
    wall-clock ``time_limit``."""

    def __init__(self, world, time_limit: float = 0.1,
                 max_steps: int = MAX_EXTRAPOLATION_STEPS):
        import threading
        self.world = world
        self.time_limit = time_limit
        self.max_steps = max_steps
        self._cv = threading.Condition()
        self._request = None
        self._result = None
        self._running = True
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="edyn-extrapolation")
        self._thread.start()

    def submit(self, snap, emap, snapshot_local_time: float, now: float,
               input_history=None, action_history=None, action_handler=None):
        with self._cv:
            self._request = (snap, emap, snapshot_local_time, now,
                             input_history, action_history, action_handler)
            self._cv.notify()

    def poll(self):
        """(snap, state, steps, timed_out) of the most recently finished
        replay, or None. Clears the slot."""
        with self._cv:
            r, self._result = self._result, None
        return r

    def stop(self):
        with self._cv:
            self._running = False
            self._cv.notify()
        self._thread.join(timeout=5.0)

    def _run(self):
        while True:
            with self._cv:
                while self._running and self._request is None:
                    self._cv.wait()
                if not self._running:
                    return
                req, self._request = self._request, None
            snap, emap, t_snap, now, hist, a_hist, a_fn = req
            state, steps, timed_out = extrapolate(
                self.world, snap, emap, t_snap, now, hist,
                max_steps=self.max_steps, time_limit=self.time_limit,
                action_history=a_hist, action_handler=a_fn)
            with self._cv:
                self._result = (snap, state, steps, timed_out)
