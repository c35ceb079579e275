"""Async worker + presentation + observability tests (reference:
stepper_async / simulation_worker behavior, profile structs)."""
import time

import numpy as np

import edyn_tpu as et
from edyn_tpu.simulation.async_worker import AsyncSimulation
from edyn_tpu.simulation.presentation import Presentation
from edyn_tpu.utils import profile
from edyn_tpu.utils.scenes import hello_world


def test_async_worker_steps_and_applies_ops():
    b, box = hello_world()
    w = et.make_world(b)
    w.step(1)  # compile before starting the clock
    sim = AsyncSimulation(w).start()
    try:
        deadline = time.time() + 30.0
        while sim.steps_done < 10 and time.time() < deadline:
            time.sleep(0.05)
        assert sim.steps_done >= 10, "worker made no progress"
        st = sim.state
        assert float(st.pos[box][1]) < 3.0  # box is falling
        # ops run on the worker thread between steps
        sim.apply_impulse(box, (50.0, 0, 0))
        base = sim.steps_done
        while sim.steps_done < base + 5 and time.time() < deadline:
            time.sleep(0.05)
        assert float(sim.state.linvel[box][0]) > 1.0
    finally:
        sim.stop()


def test_presentation_extrapolates():
    b, box = hello_world()
    w = et.make_world(b)
    w.step(30)
    pres = Presentation(w)
    st = w.state
    t = float(st.sim_time)
    pos_now, _ = pres.transforms(t)
    pos_later, _ = pres.transforms(t + 0.5 / 60.0)
    vy = float(st.linvel[box][1])
    # extrapolated by velocity over half a step
    np.testing.assert_allclose(pos_later[box][1] - pos_now[box][1],
                               vy * 0.5 / 60.0, atol=1e-5)


def test_presentation_discontinuity_decays():
    b, box = hello_world()
    w = et.make_world(b)
    w.step(5)
    pres = Presentation(w)
    pres.add_discontinuity([box], np.array([[1.0, 0, 0]], np.float32))
    for _ in range(30):
        pres.on_step()
    pos, _ = pres.transforms(float(w.state.sim_time))
    assert abs(pos[box][0] - float(w.state.pos[box][0])) < 0.05


def test_counters():
    b, box = hello_world()
    w = et.make_world(b)
    w.step(120)
    c = profile.counters(w.state)
    assert c.num_bodies == 2
    assert c.num_manifolds == 1
    assert c.num_contact_points >= 1
    assert c.num_islands == 1
    assert c.num_awake in (0, 1)  # may have fallen asleep


def test_profile_step_runs():
    b, box = hello_world()
    w = et.make_world(b)
    w.step(2)
    timers = profile.profile_step(w, repeats=1)
    for phase in ("broadphase", "narrowphase", "islands", "solve",
                  "position_correction", "full_step"):
        assert phase in timers and timers[phase] >= 0.0


def test_async_raycast_and_query():
    """Async raycast/query delivered via callback on the worker thread
    (reference: raycast_service batching, stepper_async.cpp:352-363)."""
    b, box = hello_world()
    w = et.make_world(b)
    w.step(1)
    sim = AsyncSimulation(w).start()
    results = []
    try:
        sim.raycast_async((0.0, 5.0, 0.0), (0.0, -1.0, 0.0), results.append)
        sim.query_aabb_async((-1, -1, -1), (1, 10, 1), results.append)
        deadline = time.time() + 30.0
        while len(results) < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert len(results) == 2
        # ops and the coalesced raycast flush drain in either order
        ray = next(r for r in results if isinstance(r, dict))
        assert ray["entity"] >= 0  # ray hits plane or box
    finally:
        sim.stop()


def test_async_raycasts_are_batched():
    """100 raycasts enqueued between steps coalesce into ONE batched device
    program (reference: raycast_service batches queued rays through shared
    phases, raycast_service.cpp:118)."""
    b, box = hello_world()
    w = et.make_world(b)
    w.step(1)
    sim = AsyncSimulation(w)
    results = []
    for k in range(100):
        x = (k % 10) * 0.01
        sim.raycast_async((x, 5.0, 0.0), (x, -1.0, 0.0), results.append)
    # drive the flush directly (no thread: deterministic single flush)
    sim._flush_raycasts()
    assert len(results) == 100
    assert sim.raycast_batches == 1
    assert all(r["entity"] >= 0 for r in results)
    assert all(abs(r["normal"][1] - 1.0) < 1e-3 for r in results)
