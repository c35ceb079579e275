"""Paged terrain: tiled trimesh with proximity-driven page streaming.

Reference: paged_triangle_mesh (include/edyn/shapes/paged_triangle_mesh.hpp:
1-335) — a static tree of submeshes whose pages stream in/out on background
jobs by AABB proximity, with binary page caches
(serialization/paged_triangle_mesh_s11n) and load reporting hooks
(util/paged_mesh_load_reporting.*, Design.md:187-197).

TPU design, two tiers:

1. resident (pool_slots=None): tiles baked at build as mesh-table entries
   with pre-allocated STATIC body slots; "loading" toggles the body's valid
   mask (one device scalar write).
2. STREAMING (pool_slots=K): the device mesh table is a fixed pool of K tile
   slots; tile geometry lives host-side (numpy, with optional .npz binary
   caches on disk — the reference's page cache) and is DMA'd into a pool
   slot on demand; evicted tiles free their slot. HBM holds K tiles no
   matter how large the terrain is.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import numpy as np

from ..core.builder import Material, RigidBodyDef, WorldBuilder
from ..core.state import KIND_STATIC
from .params import MeshShape


class PagedTerrain:
    """Builds tile bodies at scene-build time and streams their activation.

    usage:
        terrain = PagedTerrain(builder, vertices, indices, tile_size=8.0)
        world = et.make_world(builder)
        terrain.attach(world)
        ... per frame: terrain.update()   # activates tiles near awake bodies
    """

    def __init__(self, builder: WorldBuilder, vertices, indices,
                 tile_size: float = 8.0, material: Optional[Material] = None,
                 load_distance: float = 4.0,
                 on_page_load: Optional[Callable] = None,
                 on_page_unload: Optional[Callable] = None,
                 start_loaded: bool = False,
                 pool_slots: Optional[int] = None,
                 cache_dir: Optional[str] = None,
                 prefetch_distance: Optional[float] = None,
                 prefetch: bool = True):
        vertices = np.asarray(vertices, np.float64)
        indices = np.asarray(indices, np.int64)
        material = material or Material(friction=0.7)
        self.tile_size = float(tile_size)
        self.load_distance = float(load_distance)
        # prefetch radius > activation radius so pages decode on the
        # background thread BEFORE a body gets close enough to need them
        # (reference: background page-load jobs,
        # triangle_mesh_page_loader.hpp:10)
        self.prefetch_distance = (float(prefetch_distance)
                                  if prefetch_distance is not None
                                  else 3.0 * float(load_distance))
        self.prefetch_enabled = prefetch
        self.prefetch_misses = 0  # loads that found no prefetched row
        self.on_page_load = on_page_load
        self.on_page_unload = on_page_unload
        self.world = None
        self.pool_slots = pool_slots
        self.cache_dir = cache_dir
        self._prefetch_thread = None
        self._prefetch_stop = False
        import threading
        self._ready_lock = threading.Lock()
        self._ready: dict = {}  # tile -> decoded row (prefetch cache)

        # tile split over the dominant plane
        tv = vertices[indices]
        lo = tv.reshape(-1, 3).min(axis=0)
        hi = tv.reshape(-1, 3).max(axis=0)
        up = int(np.argmin(hi - lo))
        axes = [a for a in range(3) if a != up]
        cent = tv.mean(axis=1)
        cx = ((cent[:, axes[0]] - lo[axes[0]]) // tile_size).astype(int)
        cy = ((cent[:, axes[1]] - lo[axes[1]]) // tile_size).astype(int)

        self.bodies: list[int] = []
        self.centers: list[np.ndarray] = []
        self.loaded: list[bool] = []
        tiles: list[MeshShape] = []
        for key in sorted(set(zip(cx.tolist(), cy.tolist()))):
            tri_ids = np.nonzero((cx == key[0]) & (cy == key[1]))[0]
            sub_tris = indices[tri_ids]
            used = np.unique(sub_tris)
            remap = np.full(len(vertices), -1, np.int64)
            remap[used] = np.arange(len(used))
            tile = MeshShape(vertices=vertices[used].astype(np.float32),
                             indices=remap[sub_tris])
            tiles.append(tile)
            if pool_slots is None:
                body = builder.make_rigidbody(RigidBodyDef(
                    kind=KIND_STATIC, shape=tile, material=material))
            else:
                # streaming: the body is amorphous at build; stream-in
                # assigns MESH type + a pool slot
                body = builder.make_rigidbody(RigidBodyDef(
                    kind=KIND_STATIC, shape=None, material=material))
            self.bodies.append(body)
            self.centers.append(tv[tri_ids].reshape(-1, 3).mean(axis=0))
            self.loaded.append(start_loaded if pool_slots is None else False)
        if pool_slots is None:
            self._pending_deactivate = [] if start_loaded else list(self.bodies)
        else:
            self._bake_host_tiles(tiles)
            # slot assignment state
            self.tile_slot = [-1] * len(self.bodies)
            self.slot_tile = [-1] * pool_slots

    # -- streaming tier ---------------------------------------------------
    def _bake_host_tiles(self, tiles):
        """Bake every tile to mesh-table ROW format, with optional .npz
        binary caches (reference: paged_triangle_mesh_s11n page cache).

        With a cache_dir, baked rows live ON DISK only — host RAM holds just
        the per-tile size metadata plus the prefetch cache, so terrain size
        is bounded by disk, not RAM (reference Design.md:187-197). Without
        one, rows stay in RAM (small terrains)."""
        from .mesh import build_grid, preprocess_trimesh
        rows = []
        sizes = []
        for k, tile in enumerate(tiles):
            cache = (os.path.join(self.cache_dir, f"tile_{k}.npz")
                     if self.cache_dir else None)
            if cache and os.path.exists(cache):
                d = np.load(cache)
                row = {n: d[n] for n in d.files}
            else:
                tv, n, adj, fr, re = preprocess_trimesh(tile.vertices,
                                                        tile.indices)
                grid, origin, cell, gaxes, bounds, _ = build_grid(tv)
                row = dict(tv=tv.astype(np.float32), n=n.astype(np.float32),
                           adj=adj.astype(np.float32), fr=fr.astype(np.float32),
                           re=re.astype(np.float32), grid=grid,
                           origin=origin.astype(np.float32),
                           cell=np.float32(cell), axes=gaxes,
                           lo=np.asarray(bounds[0], np.float32),
                           hi=np.asarray(bounds[1], np.float32))
                if cache:
                    os.makedirs(self.cache_dir, exist_ok=True)
                    np.savez_compressed(cache, **row)
            sizes.append((len(row["tv"]),) + row["grid"].shape)
            rows.append(None if self.cache_dir else row)
        self._host_tiles = rows
        self._maxt = max(s[0] for s in sizes)
        self._gx = max(s[1] for s in sizes)
        self._gy = max(s[2] for s in sizes)
        self._gcap = max(s[3] for s in sizes)

    def _get_row(self, k: int):
        """Decoded row for tile k: prefetch cache -> RAM -> disk."""
        with self._ready_lock:
            r = self._ready.get(k)
        if r is not None:
            return r
        if self._host_tiles[k] is not None:
            return self._host_tiles[k]
        d = np.load(os.path.join(self.cache_dir, f"tile_{k}.npz"))
        return {n: d[n] for n in d.files}

    def _make_pool_table(self):
        """Device mesh-table pool: pool_slots rows sized to the largest tile."""
        import jax.numpy as jnp
        from .mesh import MeshTable
        K, T = self.pool_slots, self._maxt
        z = lambda *s, **k: jnp.zeros(s, **k)
        return MeshTable(
            tri_verts=z(K, T, 3, 3), tri_normal=z(K, T, 3),
            adj_normal=z(K, T, 3, 3), tri_mask=z(K, T, dtype=bool),
            tri_friction=jnp.ones((K, T)), tri_restitution=jnp.ones((K, T)),
            aabb=z(K, 2, 3),
            grid=jnp.full((K, self._gx, self._gy, self._gcap), -1, jnp.int32),
            grid_origin=z(K, 2), grid_cell=jnp.ones((K,)),
            grid_axes=z(K, 2, dtype=jnp.int32))

    def _write_tile(self, slot: int, k: int):
        """DMA one host tile into a device pool slot."""
        import jax.numpy as jnp
        r = self._get_row(k)
        T = len(r["tv"])
        m = self.world.state.mesh
        pad = lambda x, w: np.pad(x, [(0, w - x.shape[0])] +
                                  [(0, 0)] * (x.ndim - 1))
        g = np.full((self._gx, self._gy, self._gcap), -1, np.int32)
        g[:r["grid"].shape[0], :r["grid"].shape[1], :r["grid"].shape[2]] = \
            r["grid"]
        mask = np.zeros((self._maxt,), bool)
        mask[:T] = True
        fr = np.ones((self._maxt,), np.float32)
        fr[:T] = r["fr"]
        re = np.ones((self._maxt,), np.float32)
        re[:T] = r["re"]
        m = dataclasses.replace(
            m,
            tri_verts=m.tri_verts.at[slot].set(
                jnp.asarray(pad(r["tv"], self._maxt))),
            tri_normal=m.tri_normal.at[slot].set(
                jnp.asarray(pad(r["n"], self._maxt))),
            adj_normal=m.adj_normal.at[slot].set(
                jnp.asarray(pad(r["adj"], self._maxt))),
            tri_mask=m.tri_mask.at[slot].set(jnp.asarray(mask)),
            tri_friction=m.tri_friction.at[slot].set(jnp.asarray(fr)),
            tri_restitution=m.tri_restitution.at[slot].set(jnp.asarray(re)),
            aabb=m.aabb.at[slot].set(jnp.asarray(
                np.stack([r["lo"], r["hi"]]))),
            grid=m.grid.at[slot].set(jnp.asarray(g)),
            grid_origin=m.grid_origin.at[slot].set(jnp.asarray(r["origin"])),
            grid_cell=m.grid_cell.at[slot].set(float(r["cell"])),
            grid_axes=m.grid_axes.at[slot].set(jnp.asarray(r["axes"])))
        self.world.state = dataclasses.replace(self.world.state, mesh=m)

    # -- background prefetch ---------------------------------------------
    def _near_tiles(self, pos, vel, radius: float, horizon: float = 0.25):
        """Tile ids whose center is within ``radius`` of any position or its
        velocity-predicted position ``horizon`` seconds ahead."""
        if not len(pos):
            return []
        pts = np.concatenate([pos, pos + vel * horizon])
        out = []
        for k, center in enumerate(self.centers):
            if (np.abs(pts - center).max(axis=1)
                    < self.tile_size / 2 + radius).any():
                out.append(k)
        return out

    def _prefetch_loop(self):
        import time
        while not self._prefetch_stop:
            try:
                st = self.world.state
                awake = np.asarray(st.is_dynamic) & ~np.asarray(st.asleep)
                pos = np.asarray(st.pos)[awake]
                vel = np.asarray(st.linvel)[awake]
                want = self._near_tiles(pos, vel, self.prefetch_distance)
                with self._ready_lock:
                    have = set(self._ready)
                for k in want:
                    if self._prefetch_stop:
                        return
                    if k in have or self.loaded[k]:
                        continue
                    row = self._get_row(k)  # disk decode off the sim thread
                    with self._ready_lock:
                        self._ready[k] = row
                # evict prefetched rows that fell out of range (bound RAM)
                keep = set(want)
                with self._ready_lock:
                    for k in list(self._ready):
                        if k not in keep:
                            del self._ready[k]
            except Exception:
                pass  # terrain may be mid-teardown; retry next tick
            time.sleep(0.01)

    def stop(self):
        """Stop the prefetch thread (pool/streaming tier only)."""
        self._prefetch_stop = True
        if self._prefetch_thread is not None:
            self._prefetch_thread.join(timeout=2.0)
            self._prefetch_thread = None

    def attach(self, world):
        self.world = world
        if self.pool_slots is None:
            if self._pending_deactivate:
                self._set_valid(self._pending_deactivate, False)
                self._pending_deactivate = []
        else:
            import jax.numpy as jnp
            from ..shapes.params import ShapeType
            # swap in the pool mesh table (re-jits once: table shapes change)
            st = dataclasses.replace(world.state, mesh=self._make_pool_table())
            idx = jnp.asarray(self.bodies, jnp.int32)
            st = dataclasses.replace(
                st,
                valid=st.valid.at[idx].set(False),
                shape_type=st.shape_type.at[idx].set(int(ShapeType.MESH)))
            world.state = st
            world.meta = dataclasses.replace(
                world.meta,
                types_present=world.meta.types_present | {int(ShapeType.MESH)})
            if self.prefetch_enabled:
                import threading
                self._prefetch_thread = threading.Thread(
                    target=self._prefetch_loop, daemon=True,
                    name="edyn-terrain-prefetch")
                self._prefetch_thread.start()
        return self

    def _set_valid(self, bodies, value: bool):
        import jax.numpy as jnp
        st = self.world.state
        idx = jnp.asarray(bodies, jnp.int32)
        self.world.state = dataclasses.replace(
            st, valid=st.valid.at[idx].set(value))

    def update(self):
        """Activate pages near awake dynamic bodies, deactivate the rest
        (the reference's proximity-driven page loader). In streaming mode,
        loading a page DMAs its geometry into a free device pool slot."""
        assert self.world is not None, "call attach(world) first"
        st = self.world.state
        awake = np.asarray(st.is_dynamic) & ~np.asarray(st.asleep)
        pos = np.asarray(st.pos)[awake]
        want_load, want_unload = [], []
        for k, center in enumerate(self.centers):
            dist = (np.abs(pos - center).max(axis=1).min()
                    if len(pos) else np.inf)
            near = dist < self.tile_size / 2 + self.load_distance
            if near and not self.loaded[k]:
                want_load.append((dist, k))
            elif not near and self.loaded[k]:
                want_unload.append(k)
        # nearest first: when the pool can't hold every tile in range, the
        # tiles actually under bodies win the slots
        want_load = [k for _, k in sorted(want_load)]

        if self.pool_slots is None:
            for k in want_load:
                self.loaded[k] = True
                if self.on_page_load:
                    self.on_page_load(k, self.bodies[k])
            for k in want_unload:
                self.loaded[k] = False
                if self.on_page_unload:
                    self.on_page_unload(k, self.bodies[k])
            if want_load:
                self._set_valid([self.bodies[k] for k in want_load], True)
            if want_unload:
                self._set_valid([self.bodies[k] for k in want_unload], False)
            return len(want_load), len(want_unload)

        # streaming: free evicted slots first, then fill
        import jax.numpy as jnp
        loaded_n = 0
        for k in want_unload:
            self.loaded[k] = False
            slot = self.tile_slot[k]
            self.tile_slot[k] = -1
            if slot >= 0:
                self.slot_tile[slot] = -1
            self._set_valid([self.bodies[k]], False)
            if self.on_page_unload:
                self.on_page_unload(k, self.bodies[k])
        for k in want_load:
            try:
                slot = self.slot_tile.index(-1)
            except ValueError:
                break  # pool exhausted — farther tiles stay unloaded
            self.slot_tile[slot] = k
            self.tile_slot[k] = slot
            with self._ready_lock:
                was_ready = k in self._ready or self._host_tiles[k] is not None
            if not was_ready:
                self.prefetch_misses += 1
            self._write_tile(slot, k)
            body = self.bodies[k]
            stt = self.world.state
            self.world.state = dataclasses.replace(
                stt,
                shape_index=stt.shape_index.at[body].set(slot),
                valid=stt.valid.at[body].set(True))
            self.loaded[k] = True
            loaded_n += 1
            if self.on_page_load:
                self.on_page_load(k, body)
        return loaded_n, len(want_unload)

    @property
    def resident_slots_used(self) -> int:
        if self.pool_slots is None:
            return sum(self.loaded)
        return sum(1 for t in self.slot_tile if t >= 0)

    @property
    def num_loaded(self) -> int:
        return sum(self.loaded)
