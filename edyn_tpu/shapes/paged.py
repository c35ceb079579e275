"""Paged terrain: tiled trimesh with proximity-driven page activation.

Reference: paged_triangle_mesh (include/edyn/shapes/paged_triangle_mesh.hpp:
1-335) — a static tree of submeshes whose pages stream in/out on background
jobs by AABB proximity, with load reporting hooks
(util/paged_mesh_load_reporting.*, Design.md:187-197).

TPU design: tiles are baked at build as independent mesh-table entries, each
with a pre-allocated STATIC body slot; "loading" a page toggles its body's
valid mask (one device scalar write — pages out of range cost nothing in
broadphase/narrowphase because invalid bodies are filtered). The geometry
stays device-resident (static tables); what streams is participation, which
is what collision semantics need. Host-offload of far-tile geometry is a
later optimization. Load/unload events mirror the reference's
paged_mesh_load_reporting hooks.
"""
from __future__ import annotations

import dataclasses
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
                 start_loaded: bool = False):
        vertices = np.asarray(vertices, np.float64)
        indices = np.asarray(indices, np.int64)
        material = material or Material(friction=0.7)
        self.tile_size = float(tile_size)
        self.load_distance = float(load_distance)
        self.on_page_load = on_page_load
        self.on_page_unload = on_page_unload
        self.world = None

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
        for key in sorted(set(zip(cx.tolist(), cy.tolist()))):
            tri_ids = np.nonzero((cx == key[0]) & (cy == key[1]))[0]
            sub_tris = indices[tri_ids]
            used = np.unique(sub_tris)
            remap = np.full(len(vertices), -1, np.int64)
            remap[used] = np.arange(len(used))
            tile = MeshShape(vertices=vertices[used].astype(np.float32),
                             indices=remap[sub_tris])
            body = builder.make_rigidbody(RigidBodyDef(
                kind=KIND_STATIC, shape=tile, material=material))
            self.bodies.append(body)
            self.centers.append(tv[tri_ids].reshape(-1, 3).mean(axis=0))
            self.loaded.append(start_loaded)
        self._pending_deactivate = [] if start_loaded else list(self.bodies)

    def attach(self, world):
        self.world = world
        if self._pending_deactivate:
            self._set_valid(self._pending_deactivate, False)
            self._pending_deactivate = []
        return self

    def _set_valid(self, bodies, value: bool):
        import jax.numpy as jnp
        st = self.world.state
        idx = jnp.asarray(bodies, jnp.int32)
        self.world.state = dataclasses.replace(
            st, valid=st.valid.at[idx].set(value))

    def update(self):
        """Activate pages near awake dynamic bodies, deactivate the rest
        (the reference's proximity-driven page loader)."""
        assert self.world is not None, "call attach(world) first"
        st = self.world.state
        awake = np.asarray(st.is_dynamic) & ~np.asarray(st.asleep)
        pos = np.asarray(st.pos)[awake]
        to_load, to_unload = [], []
        for k, (body, center) in enumerate(zip(self.bodies, self.centers)):
            near = bool(len(pos)) and bool(
                (np.abs(pos - center).max(axis=1)
                 < self.tile_size / 2 + self.load_distance).any())
            if near and not self.loaded[k]:
                self.loaded[k] = True
                to_load.append(body)
                if self.on_page_load:
                    self.on_page_load(k, body)
            elif not near and self.loaded[k]:
                self.loaded[k] = False
                to_unload.append(body)
                if self.on_page_unload:
                    self.on_page_unload(k, body)
        if to_load:
            self._set_valid(to_load, True)
        if to_unload:
            self._set_valid(to_unload, False)
        return len(to_load), len(to_unload)

    @property
    def num_loaded(self) -> int:
        return sum(self.loaded)
