"""Paged terrain streaming (reference: shapes/test_paged_trimesh.cpp)."""
import numpy as np

import edyn_tpu as et
from edyn_tpu.shapes.paged import PagedTerrain
from test_mesh import make_grid_mesh


def test_paged_terrain_streams_and_collides():
    verts, tris = make_grid_mesh(24, 24, 1.0)
    # fix winding upward
    n = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                 verts[tris[:, 2]] - verts[tris[:, 0]])
    tris[n[:, 1] < 0] = tris[n[:, 1] < 0][:, [0, 2, 1]]

    b = et.WorldBuilder()
    loads, unloads = [], []
    terrain = PagedTerrain(b, verts, tris, tile_size=6.0,
                           on_page_load=lambda k, e: loads.append(k),
                           on_page_unload=lambda k, e: unloads.append(k))
    ball = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.SphereShape(0.3), position=(-8.0, 1.0, -8.0),
        linvel=(8.0, 0, 8.0),
        material=et.Material(friction=0.02, roll_friction=0.0),
        sleeping_disabled=True))
    w = et.make_world(b)
    terrain.attach(w)
    assert terrain.num_loaded == 0

    terrain.update()
    assert terrain.num_loaded >= 1, "page under the ball should load"
    first_loaded = terrain.num_loaded

    ys = []
    for _ in range(150):
        w.step()
        terrain.update()
        ys.append(float(w.position(ball)[1]))
    # ball crossed tiles without falling through (pages loaded in time)
    assert min(ys) > 0.1, min(ys)
    assert len(loads) > first_loaded, "no additional pages streamed in"
    assert len(unloads) >= 1, "left-behind pages never unloaded"
    p = w.position(ball)
    assert p[0] > -2.0, "ball didn't travel"


def test_streaming_pool_bounded_memory():
    """Streaming tier: device mesh table is a fixed K-slot pool; tiles DMA
    in/out on demand and HBM never holds more than K tiles (reference:
    paged_triangle_mesh disk-backed page streaming + binary caches)."""
    import tempfile
    verts, tris = make_grid_mesh(24, 24, 1.0)
    n = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                 verts[tris[:, 2]] - verts[tris[:, 0]])
    tris[n[:, 1] < 0] = tris[n[:, 1] < 0][:, [0, 2, 1]]

    with tempfile.TemporaryDirectory() as cache:
        b = et.WorldBuilder()
        terrain = PagedTerrain(b, verts, tris, tile_size=6.0,
                               pool_slots=4, cache_dir=cache)
        n_tiles = len(terrain.bodies)
        assert n_tiles > 4, "scene must have more tiles than pool slots"
        ball = b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.SphereShape(0.3), position=(-8.0, 1.0, -8.0),
            linvel=(8.0, 0, 8.0),
            material=et.Material(friction=0.02, roll_friction=0.0),
            sleeping_disabled=True))
        w = et.make_world(b)
        terrain.attach(w)
        # pool table has exactly 4 rows regardless of tile count
        assert w.state.mesh.tri_verts.shape[0] == 4
        import os
        assert len(os.listdir(cache)) == n_tiles  # binary page caches baked

        terrain.update()
        assert terrain.resident_slots_used >= 1
        ys = []
        for _ in range(150):
            w.step()
            terrain.update()
            assert terrain.resident_slots_used <= 4
            ys.append(float(w.position(ball)[1]))
        assert min(ys) > 0.1, min(ys)  # no tunnelling through streamed tiles
        assert float(w.position(ball)[0]) > -2.0

        # a second terrain from the same cache dir skips re-baking
        b2 = et.WorldBuilder()
        t2 = PagedTerrain(b2, verts, tris, tile_size=6.0,
                          pool_slots=4, cache_dir=cache)
        assert len(t2._host_tiles) == n_tiles


def test_prefetch_thread_keeps_loads_off_the_step():
    """Background prefetch (reference: triangle_mesh_page_loader.hpp:10 +
    paged_triangle_mesh_s11n disk cache): a body crossing a 100+-tile
    terrain never waits on a disk decode inside update() — every activation
    finds its row already prefetched, and rows round-trip from disk only
    (host RAM holds no baked tiles in cache_dir mode)."""
    import tempfile
    import time
    verts, tris = make_grid_mesh(24, 24, 1.0)
    n = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                 verts[tris[:, 2]] - verts[tris[:, 0]])
    tris[n[:, 1] < 0] = tris[n[:, 1] < 0][:, [0, 2, 1]]

    with tempfile.TemporaryDirectory() as cache:
        b = et.WorldBuilder()
        terrain = PagedTerrain(b, verts, tris, tile_size=2.0,
                               pool_slots=24, cache_dir=cache,
                               load_distance=2.0, prefetch_distance=8.0)
        assert len(terrain.bodies) >= 100, len(terrain.bodies)
        # disk-only baking: no decoded rows pinned in RAM
        assert all(r is None for r in terrain._host_tiles)
        ball = b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.SphereShape(0.3), position=(-10.0, 0.8, -10.0),
            linvel=(10.0, 0, 10.0),
            material=et.Material(friction=0.02, roll_friction=0.0),
            sleeping_disabled=True))
        w = et.make_world(b)
        terrain.attach(w)
        assert terrain._prefetch_thread is not None
        time.sleep(0.5)  # let the prefetcher decode the starting tiles
        terrain.update()
        ys = []
        for _ in range(130):
            w.step()
            w.block_until_ready()
            time.sleep(0.005)  # render-frame pacing the prefetcher rides on
            terrain.update()
            ys.append(float(w.position(ball)[1]))
        terrain.stop()
        assert min(ys) > 0.1, min(ys)  # no tunnelling: pages arrived in time
        assert float(w.position(ball)[0]) > -4.0  # crossed multiple tiles
        assert terrain.prefetch_misses == 0, \
            f"{terrain.prefetch_misses} activations waited on a disk decode"
