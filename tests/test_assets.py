"""Asset sync-before-instantiate + per-component snapshot fidelity
(reference: asset_ref/asset_entry handshake, Design.md:333-347;
client/server_snapshot_exporter component policies)."""
import numpy as np

import edyn_tpu as et
from edyn_tpu.networking import NetworkClient, NetworkServer, packets as pk
from edyn_tpu.networking.wire import decode_packet, encode_packet
from edyn_tpu.replication.exporter import SnapshotPolicy, policy_from_world


class BytesChannel:
    def __init__(self):
        self.q = []

    def send(self, p):
        self.q.append(encode_packet(p))

    def drain(self, h, t):
        q, self.q = self.q, []
        for raw in q:
            h(decode_packet(raw), t)


def _world(capacity=16):
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.6)))
    return et.make_world(b, capacity=capacity)


CRATE = 7  # asset id


def _loop(server, client, to_server, to_client, now, steps, dt=1 / 60,
          server_world=None):
    for _ in range(steps):
        now += dt
        client.update(now)
        to_server.drain(lambda p, t: server.receive(1, p, t), now)
        if server_world is not None:
            server_world.step(1)
        server.update(now)
        to_client.drain(client.receive, now)
    return now


def test_asset_known_locally_instantiates_without_request():
    sw, cw = _world(), _world()
    tc, ts = BytesChannel(), BytesChannel()
    server = NetworkServer(sw)
    server.register_client(1, tc.send)
    client = NetworkClient(cw, ts.send, enable_extrapolation=False)
    crate_def = et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.25),
                                position=(0, 2, 0),
                                material=et.Material(friction=0.5))
    server.register_asset(CRATE, crate_def)
    client.register_asset(CRATE, crate_def)

    e = server.spawn_asset(CRATE, position=(1.0, 3.0, 0.0))
    sent_requests = []
    orig = client.send
    client.send = lambda p: (sent_requests.append(p)
                             if isinstance(p, pk.AssetRequest) else orig(p))
    _loop(server, client, ts, tc, 0.0, 30, server_world=sw)
    assert client.entity_map.has_remote(e)
    loc = client.entity_map.to_local(e)
    # instantiated from the local asset def at the server's live position
    assert abs(float(cw.position(loc)[0]) - 1.0) < 0.5
    assert not sent_requests, "asset was known — no request expected"


def test_unknown_asset_requested_then_instantiated():
    sw, cw = _world(), _world()
    tc, ts = BytesChannel(), BytesChannel()
    server = NetworkServer(sw)
    server.register_client(1, tc.send)
    client = NetworkClient(cw, ts.send, enable_extrapolation=False)
    server.register_asset(CRATE, et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.25), position=(0, 2, 0)))
    e = server.spawn_asset(CRATE, position=(0.0, 4.0, 0.0))
    _loop(server, client, ts, tc, 0.0, 30, server_world=sw)
    # handshake completed: asset synced, entity instantiated
    assert CRATE in client.assets
    assert client.entity_map.has_remote(e)


def test_reliable_policy_syncs_material_change():
    """friction is a RELIABLE component: a server-side change reaches the
    client via GeneralSnapshot without any entity re-enter."""
    sw, cw = _world(), _world()
    tc, ts = BytesChannel(), BytesChannel()
    server = NetworkServer(sw)
    server.register_client(1, tc.send)
    client = NetworkClient(cw, ts.send, enable_extrapolation=False)
    ball = sw.spawn(et.RigidBodyDef(mass=1.0, shape=et.SphereShape(0.3),
                                    position=(0, 2, 0), networked=True))
    now = _loop(server, client, ts, tc, 0.0, 30, server_world=sw)
    loc = client.entity_map.to_local(ball)
    # server mutates a reliable component
    import dataclasses
    sw.state = dataclasses.replace(
        sw.state, friction=sw.state.friction.at[ball].set(0.123))
    _loop(server, client, ts, tc, now, 90, server_world=sw)  # > 1 s
    assert abs(float(np.asarray(cw.state.friction[loc])) - 0.123) < 1e-6


def test_user_component_policy_registers():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0)))
    b.register_component("health", default=100.0, replicate="reliable")
    b.register_component("steer", default=0.0, replicate="input")
    w = et.make_world(b, capacity=8)
    pol = policy_from_world(w)
    assert "health" in pol.reliable
    assert "steer" in pol.input
    assert "position" in pol.transient


def test_entity_entered_assets_roundtrip_on_wire():
    from edyn_tpu.replication.snapshot import RegistrySnapshot
    p = pk.EntityEntered(
        timestamp=1.0,
        snapshot=RegistrySnapshot(entities=np.array([4], np.int32),
                                  pools={"position": np.zeros((1, 3),
                                                              np.float32)}),
        owners={4: 1}, assets={4: CRATE})
    got = decode_packet(encode_packet(p))
    assert got.assets == {4: CRATE}
    assert got.owners == {4: 1}
