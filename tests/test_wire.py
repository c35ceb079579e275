"""Byte-level networking: every packet crosses the channel as BYTES (no
pickle, no live objects), with loss on unreliable packets; input history is
pure data and replays server-side (reference:
networking/packet/edyn_packet.hpp serialization + should_send_reliably,
networking/util/input_state_history.hpp replay)."""
import numpy as np
import pytest

import edyn_tpu as et
from edyn_tpu.networking import NetworkClient, NetworkServer, packets as pk
from edyn_tpu.networking.input_history import InputHistory, InputRecord
from edyn_tpu.networking.wire import WireError, decode_packet, encode_packet
from edyn_tpu.replication.snapshot import RegistrySnapshot


def _snap():
    return RegistrySnapshot(
        entities=np.array([3, 7, 20], np.int32),
        pools={"position": np.arange(9, dtype=np.float32).reshape(3, 3),
               "kind": np.array([0, 1, 2], np.int32)},
        timestamp=12.5)


def _assert_snap_equal(a, b):
    np.testing.assert_array_equal(a.entities, b.entities)
    assert set(a.pools) == set(b.pools)
    for k in a.pools:
        np.testing.assert_array_equal(a.pools[k], b.pools[k])
        assert np.asarray(a.pools[k]).dtype == np.asarray(b.pools[k]).dtype
    assert a.timestamp == b.timestamp


ROUNDTRIP_CASES = [
    pk.ClientCreatedEntity(timestamp=1.0, entities=[1, 2],
                           defs=[{"mass": 1.0, "shape": {"type": "SphereShape",
                                                         "radius": 0.5}}]),
    pk.ClientDestroyedEntity(timestamp=2.0, entities=[5, 9, 100]),
    pk.EntityEntered(timestamp=3.0, snapshot=_snap(), owners={3: 1, 7: 2}),
    pk.EntityExited(timestamp=4.0, entities=[8]),
    pk.UpdateEntityMap(timestamp=5.0, pairs=[(1, 10), (2, 30)]),
    pk.TransientSnapshot(timestamp=6.0, snapshot=_snap()),
    pk.GeneralSnapshot(timestamp=7.0, snapshot=_snap()),
    pk.TimeRequest(timestamp=8.0, id=42),
    pk.TimeResponse(timestamp=9.0, id=42, origin_time=8.0),
    pk.ServerSettings(timestamp=10.0, fixed_dt=1 / 120,
                      gravity=(0.0, -3.7, 0.0),
                      playout_delay_multiplier=1.5,
                      allow_full_ownership=False),
    pk.SetAabbOfInterest(timestamp=10.5, lo=(-1.0, -2.0, -3.0),
                         hi=(4.0, 5.0, 6.0)),
    pk.QueryEntity(timestamp=10.6, id=3,
                   queries=[(5, ["position", "linvel"]), (9, [])]),
    pk.EntityResponse(timestamp=10.7, id=3, snapshot=_snap()),
    pk.SetPlayoutDelay(timestamp=11.0, delay=0.08),
    pk.ActionPacket(timestamp=12.0, entity=4,
                    actions=[(0.5, np.array([1.0, 2.0], np.float32))]),
    pk.InputSnapshot(timestamp=13.0, entity=2, records=[
        InputRecord(timestamp=12.9, component="steer",
                    entities=np.array([2], np.int32),
                    values=np.array([0.3], np.float32))]),
]


@pytest.mark.parametrize("packet", ROUNDTRIP_CASES,
                         ids=[type(p).__name__ for p in ROUNDTRIP_CASES])
def test_packet_roundtrip(packet):
    raw = encode_packet(packet)
    assert isinstance(raw, bytes)
    got = decode_packet(raw)
    assert type(got) is type(packet)
    assert got.timestamp == packet.timestamp
    for f in ("entities", "id", "origin_time", "fixed_dt", "delay", "entity"):
        if hasattr(packet, f):
            a, b = getattr(packet, f), getattr(got, f)
            if isinstance(a, (list, np.ndarray)):
                np.testing.assert_array_equal(a, b)
            else:
                assert a == b
    if getattr(packet, "snapshot", None) is not None:
        _assert_snap_equal(packet.snapshot, got.snapshot)
    if hasattr(packet, "owners"):
        assert got.owners == packet.owners
    if hasattr(packet, "pairs"):
        assert got.pairs == packet.pairs
    if hasattr(packet, "records"):
        assert len(got.records) == len(packet.records)
        for ra, rb in zip(packet.records, got.records):
            assert ra.component == rb.component
            assert ra.timestamp == rb.timestamp
            np.testing.assert_array_equal(ra.entities, rb.entities)
            np.testing.assert_array_equal(ra.values, rb.values)
    if hasattr(packet, "queries"):
        assert [(int(e), list(cs)) for e, cs in got.queries] == \
            [(int(e), list(cs)) for e, cs in packet.queries]
    if hasattr(packet, "actions"):
        for (ta, va), (tb, vb) in zip(packet.actions, got.actions):
            assert ta == tb
            np.testing.assert_array_equal(va, vb)


def test_truncated_and_garbage_frames_rejected():
    raw = encode_packet(pk.TransientSnapshot(timestamp=6.0, snapshot=_snap()))
    with pytest.raises(WireError):
        decode_packet(raw[: len(raw) // 2])
    with pytest.raises(WireError):
        decode_packet(b"\xff" + raw[1:])
    with pytest.raises(WireError):
        decode_packet(b"")


def test_entity_delta_encoding_matches_python_fallback():
    from edyn_tpu.networking import wire
    ent = np.array([0, 1, 5, 1000, 7, -3], np.int32)
    py = wire._encode_deltas_py(ent)
    np.testing.assert_array_equal(wire._decode_deltas_py(py, len(ent)), ent)
    from edyn_tpu.native.loader import lib
    if lib() is not None:
        L = lib()
        need = L.edyn_varint_encode_deltas(np.ascontiguousarray(ent),
                                           len(ent), None)
        raw = np.empty(need, np.uint8)
        L.edyn_varint_encode_deltas(np.ascontiguousarray(ent), len(ent),
                                    raw.ctypes.data)
        assert raw.tobytes() == py  # bit-identical formats


class BytesChannel:
    """Transport that ONLY carries bytes, dropping a deterministic fraction
    of unreliable frames (reliable ones model a retransmitting transport)."""

    def __init__(self, loss=0.0, seed=0):
        self.loss = loss
        self.rng = np.random.RandomState(seed)
        self.queue = []

    def send(self, packet):
        raw = encode_packet(packet)
        assert isinstance(raw, bytes)
        if not pk.should_send_reliably(packet) and self.rng.rand() < self.loss:
            return  # dropped on the floor
        self.queue.append(raw)

    def drain(self, handler, now):
        pending, self.queue = self.queue, []
        for raw in pending:
            handler(decode_packet(raw), now)


def _world(capacity=32, with_steer=False):
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.6)))
    if with_steer:
        b.register_component("steer", shape=(), default=0.0)
    return et.make_world(b, capacity=capacity)


def test_client_server_over_lossy_bytes_channel():
    """Full loop over a bytes-only channel with 30% unreliable loss: the
    client's entity still syncs and streams (loss tolerance by re-send)."""
    server_world = _world()
    client_world = _world()
    to_client = BytesChannel(loss=0.3, seed=1)
    to_server = BytesChannel(loss=0.3, seed=2)

    server = NetworkServer(server_world)
    server.register_client(1, to_client.send)
    client = NetworkClient(client_world, to_server.send,
                           enable_extrapolation=False)

    now = 0.0
    ball = client.create_entity(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.5), position=(0, 5, 0),
        material=et.Material(friction=0.5)))
    dt = 1 / 60
    for _ in range(120):
        now += dt
        client.update(now)
        to_server.drain(lambda p, t: server.receive(1, p, t), now)
        server_world.step(1)
        server.update(now)
        to_client.drain(client.receive, now)

    assert client.entity_map.has_local(ball)
    srv_ball = client.entity_map.to_remote(ball)
    assert float(server_world.position(srv_ball)[1]) < 5.0


def test_input_history_replay_server_side():
    """Client records a user-component input stream; the server receives it
    as DATA over bytes and replays it into the owned entity's column."""
    server_world = _world(with_steer=True)
    client_world = _world(with_steer=True)
    to_client = BytesChannel()
    to_server = BytesChannel(loss=0.5, seed=3)  # heavy loss; resend covers it

    server = NetworkServer(server_world)
    server.register_client(1, to_client.send)
    client = NetworkClient(client_world, to_server.send,
                           enable_extrapolation=False)

    now = 0.0
    car = client.create_entity(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.4), position=(0, 1, 0)))
    dt = 1 / 60
    for step in range(120):
        now += dt
        if step == 60:
            client.record_input(now, "steer", [car], np.array([0.77]))
        client.update(now)
        to_server.drain(lambda p, t: server.receive(1, p, t), now)
        server_world.step(1)
        server.update(now)
        to_client.drain(client.receive, now)

    # client applied its own input immediately (prediction)
    assert abs(float(np.asarray(client_world.state.user["steer"][car]))
               - 0.77) < 1e-6
    # server replayed the record into ITS copy of the entity
    srv_car = client.entity_map.to_remote(car)
    assert abs(float(np.asarray(server_world.state.user["steer"][srv_car]))
               - 0.77) < 1e-6


def test_input_replay_ownership_enforced():
    """Input records targeting entities the client does not own are ignored."""
    server_world = _world(with_steer=True)
    intruder = server_world.spawn(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.3), position=(2, 1, 0),
        networked=True))
    server = NetworkServer(server_world)
    server.register_client(1, lambda p: None)
    rec = InputRecord(timestamp=0.0, component="steer",
                      entities=np.array([intruder], np.int32),
                      values=np.array([9.9], np.float32))
    server.receive(1, pk.InputSnapshot(timestamp=0.0, records=[rec]), 0.0)
    server.update(1.0)
    assert float(np.asarray(server_world.state.user["steer"][intruder])) == 0.0


def test_user_component_rides_the_step_and_checkpoint():
    """User components survive a jitted step and checkpoint round-trip
    (reference: register_external components ride replication)."""
    w = _world(with_steer=True)
    body = w.spawn(et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.5),
                                   position=(0, 3, 0)))
    from edyn_tpu.replication.snapshot import set_component
    w.state = set_component(w.state, "steer", [body], np.array([0.5]))
    w.step(3)
    assert abs(float(np.asarray(w.state.user["steer"][body])) - 0.5) < 1e-6
    from edyn_tpu.serialization.checkpoint import (
        world_from_bytes, world_to_bytes)
    blob = world_to_bytes(w.state, w.settings)
    state2, _ = world_from_bytes(blob)
    assert abs(float(np.asarray(state2.user["steer"][body])) - 0.5) < 1e-6
