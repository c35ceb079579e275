"""Networking without a network (mirrors reference
test/edyn/networking/test_net_imp_exp.cpp): two worlds + direct packet
handoff with optional simulated latency — never sockets."""
import dataclasses

import numpy as np
import pytest

import edyn_tpu as et
from edyn_tpu.networking import NetworkClient, NetworkServer, packets as pk
from edyn_tpu.replication.snapshot import (
    RegistrySnapshot, apply_snapshot, extract_snapshot,
)
from edyn_tpu.replication.entity_map import EntityMap
from edyn_tpu.serialization.checkpoint import world_from_bytes, world_to_bytes


def _empty_world(capacity=32):
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.6)))
    return et.make_world(b, capacity=capacity)


class Channel:
    """Direct packet pipe with optional latency."""
    def __init__(self, latency=0.0):
        self.latency = latency
        self.queue = []

    def send(self, packet):
        self.queue.append(packet)

    def drain(self, handler, now):
        pending = list(self.queue)
        self.queue.clear()
        for p in pending:
            handler(p, now)


def test_snapshot_export_import_roundtrip():
    """Direct snapshot between two registries (reference test_net_imp_exp)."""
    w1 = _empty_world()
    ball = w1.spawn(et.RigidBodyDef(mass=2.0, shape=et.SphereShape(0.5),
                                    position=(1, 5, 2), linvel=(1, 2, 3)))
    snap = extract_snapshot(w1.state, [ball],
                            components=("position", "linvel", "orientation",
                                        "angvel"))
    w2 = _empty_world()
    ball2 = w2.spawn(et.RigidBodyDef(mass=2.0, shape=et.SphereShape(0.5)))
    emap = EntityMap()
    emap.insert(ball, ball2)
    w2.state = apply_snapshot(w2.state, snap, emap)
    np.testing.assert_allclose(w2.position(ball2), [1, 5, 2], atol=1e-6)
    np.testing.assert_allclose(w2.linvel(ball2), [1, 2, 3], atol=1e-6)


def test_snapshot_rejects_nan():
    """Packet validation (reference Design.md:381-383)."""
    w = _empty_world()
    ball = w.spawn(et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.5),
                                   position=(0, 5, 0)))
    snap = RegistrySnapshot(
        entities=np.array([ball], np.int32),
        pools={"position": np.array([[np.nan, 1.0, 0.0]], np.float32)})
    w.state = apply_snapshot(w.state, snap)
    assert np.isfinite(np.asarray(w.state.pos[ball])).all()
    np.testing.assert_allclose(w.position(ball), [0, 5, 0], atol=1e-6)


def test_clock_sync():
    from edyn_tpu.networking.clock_sync import ClockSync
    cs = ClockSync()
    offset = 42.0  # server clock ahead
    now = 100.0
    for _ in range(5):
        req = cs.make_request(now)
        rtt = 0.1
        server_time = now + rtt / 2 + offset
        resp = pk.TimeResponse(timestamp=server_time, id=req.id,
                               origin_time=req.timestamp)
        now += rtt
        cs.process_response(resp, now)
        now += 0.9
    assert abs(cs.time_delta - offset) < 1e-3
    assert abs(cs.to_local(now + offset) - now) < 1e-3


def test_client_server_entity_sync_and_streaming():
    """Full loop: client creates an entity, server owns the sim, client
    receives streamed state; server is authoritative."""
    server_world = _empty_world()
    client_world = _empty_world()

    to_client = Channel()
    to_server = Channel()

    server = NetworkServer(server_world)
    server.register_client(1, to_client.send)
    client = NetworkClient(client_world, to_server.send,
                           enable_extrapolation=False)

    now = 0.0
    ball = client.create_entity(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 5, 0),
        material=et.Material(friction=0.5)))
    dt = 1 / 60

    for step in range(120):
        now += dt
        client.update(now)
        to_server.drain(lambda p, t: server.receive(1, p, t), now)
        server_world.step(1)
        server.update(now)
        to_client.drain(client.receive, now)

    # server instantiated the client's ball and simulated it falling
    assert client.entity_map.has_local(ball)
    srv_ball = client.entity_map.to_remote(ball)
    assert float(server_world.position(srv_ball)[1]) < 5.0
    # the server also streams its own view back; a second client-side entity
    # for the server ball must NOT have been created (identity preserved)
    assert len(client.owned) == 1


def test_server_streams_to_observer_client():
    """A client that owns nothing still receives entity_entered + snapshots."""
    server_world = _empty_world()
    ball = server_world.spawn(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 5, 0),
        material=et.Material(friction=0.5), networked=True))

    client_world = _empty_world()
    to_client = Channel()
    to_server = Channel()
    server = NetworkServer(server_world)
    server.register_client(1, to_client.send)
    client = NetworkClient(client_world, to_server.send,
                           enable_extrapolation=False)

    now = 0.0
    dt = 1 / 60
    for step in range(90):
        now += dt
        client.update(now)
        to_server.drain(lambda p, t: server.receive(1, p, t), now)
        server_world.step(1)
        client_world.step(1)   # client simulates between snapshots
        server.update(now)
        to_client.drain(client.receive, now)

    assert client.entity_map.has_remote(ball)
    loc = client.entity_map.to_local(ball)
    # client's copy tracks the server's falling ball
    d = abs(float(client_world.position(loc)[1])
            - float(server_world.position(ball)[1]))
    assert d < 0.5, f"client desynced by {d}"


def test_ownership_rejected():
    """Server ignores snapshot writes to entities the client doesn't own
    (reference: server_side.cpp ownership checks)."""
    server_world = _empty_world()
    ball = server_world.spawn(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 5, 0),
        networked=True))
    server = NetworkServer(server_world)
    sent = []
    server.register_client(1, sent.append)
    # forged snapshot targeting the server's own entity
    snap = extract_snapshot(server_world.state, [ball], ("position",))
    snap.pools["position"][:] = [99.0, 99.0, 99.0]
    c = server.clients[1]
    c.entity_map.insert(ball, ball)  # pretend mapping exists
    server.receive(1, pk.TransientSnapshot(timestamp=0.0, snapshot=snap), 0.0)
    server.update(10.0)  # past any playout delay
    assert abs(float(server_world.position(ball)[0])) < 1.0


def test_aabb_of_interest_packet_and_follow():
    """Client-driven interest box (packet/set_aabb_of_interest.hpp) and the
    follow-an-entity mode (comp/aabb_oi_follow.hpp)."""
    w = _empty_world()
    near = w.spawn(et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.5),
                                   position=(0, 5, 0), networked=True))
    remote = w.spawn(et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.5),
                                     position=(500, 5, 0), networked=True))
    w.step(1)
    server = NetworkServer(w)
    sent = []
    server.register_client(1, sent.append)
    server.update(0.0)
    entered = {e for p in sent if isinstance(p, pk.EntityEntered)
               for e in p.snapshot.entities}
    assert near in entered and remote not in entered

    # move the box over the remote entity
    sent.clear()
    server.receive(1, pk.SetAabbOfInterest(lo=(450, -50, -50),
                                           hi=(550, 50, 50)), 1.0)
    server.update(1.0)
    entered = {e for p in sent if isinstance(p, pk.EntityEntered)
               for e in p.snapshot.entities}
    exited = {e for p in sent if isinstance(p, pk.EntityExited)
              for e in p.entities}
    assert remote in entered and near in exited

    # follow mode recenters every update
    c = server.clients[1]
    c.interest.follow = near
    w.set_position(near, (100.0, 5.0, 0.0))
    w.step(1)
    server.update(2.0)
    np.testing.assert_allclose(c.interest.center,
                               np.asarray(w.position(near), np.float64),
                               atol=1e-5)


def test_action_history_roundtrip():
    """Discrete actions (reference: comp/action_history.hpp + the registered
    import_action fn): executed locally at record time (prediction), uploaded
    as ActionPacket, merged + deduped server-side, and executed once at
    playout time through the same handler."""
    import dataclasses as dc
    import jax.numpy as jnp

    def boost(state, e, payload):
        return dc.replace(
            state, linvel=state.linvel.at[e].add(
                jnp.asarray(payload, state.linvel.dtype)))

    server_world = _empty_world()
    client_world = _empty_world()
    to_client, to_server = Channel(), Channel()
    server = NetworkServer(server_world).register_action_handler(boost)
    server.register_client(1, to_client.send)
    client = NetworkClient(client_world, to_server.send,
                           enable_extrapolation=False)
    client.register_action_handler(boost)

    now = 0.0
    dt = 1 / 60
    ball = client.create_entity(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 5, 0),
        gravity=(0.0, 0.0, 0.0), sleeping_disabled=True))
    for _ in range(10):   # register entity + settle the map
        now += dt
        client.update(now)
        to_server.drain(lambda p, t: server.receive(1, p, t), now)
        server.update(now)
        to_client.drain(client.receive, now)

    client.record_action(now, ball, (5.0, 0.0, 0.0))
    # local prediction applied immediately
    assert abs(float(client_world.linvel(ball)[0]) - 5.0) < 1e-5
    for _ in range(120):  # upload (incl. re-sends), playout, converge
        now += dt
        client.update(now)
        to_server.drain(lambda p, t: server.receive(1, p, t), now)
        server.update(now)
        to_client.drain(client.receive, now)

    srv_ball = client.entity_map.to_remote(ball)
    c = server.clients[1]
    assert len(c.action_history.entries) == 1, "re-sends not deduped"
    assert len(c.action_applied) == 1, "action not executed exactly once"
    assert abs(float(server_world.linvel(srv_ball)[0]) - 5.0) < 0.1, \
        server_world.linvel(srv_ball)


def test_orientation_discontinuity_smoothing():
    """Snapping a server orientation accumulates a quaternion offset so the
    presented orientation stays continuous, then decays to the new value
    (reference: comp/discontinuity.hpp orientation_offset)."""
    cw = _empty_world()
    ball = cw.spawn(et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.5),
                                    position=(0, 5, 0), networked=True))
    client = NetworkClient(cw, lambda p: None, enable_extrapolation=False)
    client.entity_map.insert(ball, ball)

    import math
    q_new = np.array([0.0, 0.0, math.sin(math.pi / 4), math.cos(math.pi / 4)],
                     np.float32)  # 90 deg about z
    snap = RegistrySnapshot(
        entities=np.array([ball], np.int32),
        pools={"orientation": q_new[None, :]})
    client.receive(pk.TransientSnapshot(timestamp=0.0, snapshot=snap), 0.0)
    # physics state snapped...
    assert abs(float(np.dot(np.asarray(cw.state.orn)[ball], q_new))) > 0.999
    # ...but the presented orientation is still the OLD one (identity)
    po = client.presentation_orientation(ball)
    assert abs(float(po[3])) > 0.999, po
    # the offset decays: presented orientation converges to the new value
    for k in range(200):
        client.update(0.1 + 0.01 * k)
    po = client.presentation_orientation(ball)
    assert abs(float(np.dot(po, q_new))) > 0.999, po


def test_playout_delay_announced_to_client():
    """The server announces its jitter-buffer delay when it changes by >6%
    (reference: server_side.cpp:537-541 -> client ctx.server_playout_delay,
    client_side.cpp:804-807)."""
    w = _empty_world()
    to_client = Channel()
    server = NetworkServer(w)
    server.register_client(1, to_client.send)
    cw = _empty_world()
    client = NetworkClient(cw, lambda p: None, enable_extrapolation=False)
    empty = RegistrySnapshot(entities=np.zeros((0,), np.int32), pools={})
    # 1 s of observed latency drives the delay up -> announcement
    server.receive(1, pk.TransientSnapshot(timestamp=9.0, snapshot=empty),
                   10.0)
    to_client.drain(client.receive, 10.0)
    assert client.server_playout_delay > 0.0
    # converge the latency EWMA on a steady 1 s
    for k in range(1, 60):
        server.receive(1, pk.TransientSnapshot(
            timestamp=10.0 * k + 9.0, snapshot=empty), 10.0 * k + 10.0)
    to_client.drain(client.receive, 600.0)
    converged = client.server_playout_delay
    # steady latency after convergence: hysteresis suppresses announcements
    n_before = len(to_client.queue)
    server.receive(1, pk.TransientSnapshot(timestamp=609.0, snapshot=empty),
                   610.0)
    later = [p for p in to_client.queue[n_before:]
             if isinstance(p, pk.SetPlayoutDelay)]
    assert not later, "announcement fired without a significant delay change"
    # converges to within the 6% hysteresis band of the 1.0 cap
    assert abs(converged - min(1.0 * 1.2, 1.0)) < 0.1


def test_query_entity_response():
    """Client asks for specific components of specific entities; server
    replies with one snapshot (reference: packet/query_entity.hpp +
    packet/entity_response.hpp)."""
    w = _empty_world()
    ball = w.spawn(et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.5),
                                   position=(3, 5, 7), networked=True))
    w.step(1)
    to_client = Channel()
    to_server = Channel()
    server = NetworkServer(w)
    server.register_client(1, to_client.send)
    cw = _empty_world()
    client = NetworkClient(cw, to_server.send, enable_extrapolation=False)
    # the client learns about the ball via interest first
    server.update(0.0)
    to_client.drain(client.receive, 0.0)
    assert client.entity_map.has_remote(ball)
    qid = client.query_entity([(ball, ["position", "linvel"])])
    to_server.drain(lambda p, t: server.receive(1, p, t), 1.0)
    to_client.drain(client.receive, 1.0)
    snap = client.query_responses[qid]
    assert set(snap.pools) == {"position", "linvel"}
    assert list(snap.entities) == [ball]
    np.testing.assert_allclose(
        snap.pools["position"][0],
        np.asarray(w.position(ball)), atol=1e-6)
    # invalid entity ids are dropped server-side
    qid2 = client.query_entity([(999, ["position"])])
    to_server.drain(lambda p, t: server.receive(1, p, t), 2.0)
    to_client.drain(client.receive, 2.0)
    assert len(client.query_responses[qid2].entities) == 0


def test_temporary_ownership():
    """Temporary ownership (reference: remote_client.hpp:43-46,
    server_snapshot_importer.hpp is_only_reachable_client, Design.md):
    a client may set the state of un-owned entities in an island only IT
    reaches; a second client's entity in the island revokes it; the flag
    disables it entirely."""
    w = _empty_world()
    owned = w.spawn(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 0.5, 0),
        networked=True))
    prop = w.spawn(et.RigidBodyDef(      # stacked on owned -> same island
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 1.5, 0),
        networked=True))
    far = w.spawn(et.RigidBodyDef(       # separate island
        mass=1.0, shape=et.SphereShape(0.5), position=(20, 0.5, 0),
        networked=True))
    w.step(10)   # manifolds form: owned<->prop
    server = NetworkServer(w)
    c = server.register_client(1, lambda p: None)
    c.owned.add(owned)
    for e in (owned, prop, far):
        c.entity_map.insert(e, e)

    def send_move(entities, xs, now):
        snap = extract_snapshot(w.state, entities, ("position",))
        snap.pools["position"][:, 0] = xs
        server.receive(1, pk.TransientSnapshot(timestamp=now, snapshot=snap),
                       now)
        server.update(now + 10.0)

    # island companion accepted, far island rejected
    send_move([prop, far], [5.0, 50.0], 0.0)
    assert abs(float(w.position(prop)[0]) - 5.0) < 1e-4, \
        "island companion not accepted under temporary ownership"
    assert abs(float(w.position(far)[0]) - 20.0) < 1e-4, \
        "unreachable entity accepted"

    # a second client's entity joining the island revokes it
    w.set_position(prop, (0.0, 1.5, 0.0))
    w.step(10)   # re-form owned<->prop contact
    other = w.spawn(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 2.5, 0),
        networked=True))
    c2 = server.register_client(2, lambda p: None)
    c2.owned.add(other)
    w.step(10)   # prop<->other contact
    send_move([prop], [7.0], 100.0)
    assert abs(float(w.position(prop)[0])) < 1.0, \
        "contested island accepted"

    # flag off: only owned entities, ever
    c.allow_full_ownership = False
    w.destroy(other)
    w.step(10)
    send_move([prop], [9.0], 200.0)
    assert abs(float(w.position(prop)[0])) < 1.0
    send_move([owned], [3.0], 300.0)
    assert abs(float(w.position(owned)[0]) - 3.0) < 1e-4


def test_checkpoint_roundtrip():
    """World save/restore (exceeds the reference — SURVEY §5.4)."""
    b, ids = __import__("edyn_tpu.utils.scenes", fromlist=["scenes"]).box_stack(5)
    w = et.make_world(b)
    w.step(30)
    blob = world_to_bytes(w.state, w.settings)
    state2, settings2 = world_from_bytes(blob)
    np.testing.assert_allclose(np.asarray(w.state.pos), np.asarray(state2.pos))
    np.testing.assert_allclose(np.asarray(w.state.contacts.normal_impulse),
                               np.asarray(state2.contacts.normal_impulse))
    assert settings2.fixed_dt == w.settings.fixed_dt
    # restored world steps identically
    w2 = et.World(state2, settings2, w.meta)
    w.step(10)
    w2.step(10)
    np.testing.assert_allclose(np.asarray(w.state.pos),
                               np.asarray(w2.state.pos), atol=1e-6)


def test_background_extrapolation_off_receive_path():
    """receive() must hand a long replay to the worker thread and return
    quickly; the result is merged on a later update() (reference:
    extrapolation_worker.hpp:27-104)."""
    import time
    client_world = _empty_world()
    ball = client_world.spawn(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 5, 0),
        material=et.Material(friction=0.5), networked=True))
    client = NetworkClient(client_world, lambda p: None,
                           enable_extrapolation=True,
                           background_extrapolation=True,
                           extrapolation_time_limit=30.0)
    client.entity_map.insert(100, ball)
    client_world.step(1)  # compile the step before timing receive()
    client_world.block_until_ready()

    snap = extract_snapshot(client_world.state, [ball],
                            ("position", "linvel"))
    snap.entities = np.array([100], np.int32)
    snap.pools["position"][:] = [0.0, 8.0, 0.0]
    snap.pools["linvel"][:] = [0.0, 0.0, 0.0]
    # snapshot from 20 steps in the past -> a 20-step replay
    dt = client_world.settings.fixed_dt
    now = 21 * dt
    t0 = time.perf_counter()
    client.receive(pk.TransientSnapshot(timestamp=dt, snapshot=snap), now)
    recv_time = time.perf_counter() - t0
    assert recv_time < 0.05, f"receive() blocked for {recv_time*1e3:.1f} ms"

    # the replay lands asynchronously; poll update() until it merges
    deadline = time.time() + 60
    while time.time() < deadline:
        client.update(now)
        y = float(client_world.position(ball)[1])
        if abs(y - 5.0) > 0.3:  # moved off the live value -> replay applied
            break
        time.sleep(0.05)
    y = float(client_world.position(ball)[1])
    # started at 8 and fell for ~20 steps of gravity, clearly distinct from 5
    assert 6.5 < y < 8.0, f"extrapolated y={y}"
    client.close()


def test_extrapolation_wall_clock_limit():
    """The replay is bounded by wall-clock time, not only a step count
    (reference: extrapolation_worker.cpp:475-480)."""
    from edyn_tpu.networking.extrapolation import extrapolate
    w = _empty_world()
    ball = w.spawn(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 5, 0),
        material=et.Material(friction=0.5), networked=True))
    w.step(1)
    w.block_until_ready()
    snap = extract_snapshot(w.state, [ball], ("position", "linvel"))
    dt = w.settings.fixed_dt
    state, steps, timed_out = extrapolate(
        w, snap, None, 0.0, 20 * dt, time_limit=1e-6)
    assert timed_out and steps < 20


def test_adaptive_presentation_delay_converges():
    """Injected step jitter must push the presentation delay up to a
    fixed_dt boundary covering avg + deviation (stepper_async.cpp:240-277)."""
    from edyn_tpu.simulation.presentation import Presentation
    w = _empty_world()
    pres = Presentation(w, adaptive=True)
    dt = w.settings.fixed_dt
    rng = np.random.default_rng(0)
    # simulation lags the render clock by a jittery 50-70 ms
    for k in range(300):
        sim_t = k * dt
        w.state = dataclasses.replace(
            w.state, sim_time=w.state.sim_time * 0 + sim_t)
        render_t = sim_t + 0.05 + 0.02 * rng.random()
        pres.observe(render_t)
    # delay converged onto a fixed_dt boundary covering avg + deviation
    assert pres.presentation_delay >= 0.05 - 1e-6, pres.presentation_delay
    assert pres.presentation_delay <= 0.1, pres.presentation_delay
    assert abs(pres.presentation_delay / dt - round(
        pres.presentation_delay / dt)) < 1e-3
