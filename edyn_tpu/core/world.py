"""World: the user-facing handle around the state pytree + jitted stepper.

Plays the role of the reference's public API surface
(include/edyn/edyn.hpp:66-150 attach/update/step_simulation) and the
fixed-timestep accumulator (src/edyn/simulation/stepper_sequential.cpp:45-65).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Settings, scalar_dtype
from ..math import vec
from ..simulation.stepper import SceneMeta, physics_step
from .builder import WorldBuilder
from .state import KIND_DYNAMIC, WorldState, grow_contact_table


def derive_meta(state: WorldState, max_pairs: Optional[int] = None,
                **kw) -> SceneMeta:
    """Compute the static scene facts from a freshly built state (host read —
    done once at attach time, like the reference's engine init)."""
    stypes = np.asarray(state.shape_type)
    valid = np.asarray(state.valid)
    present = frozenset(int(t) for t in np.unique(stypes[valid]))
    if max_pairs is None:
        n = int(valid.sum())
        # tight admission (PAIR_SEPARATION_MARGIN carried boxes) measures
        # 14.2 valid pairs/body on the settled 10k mixed pile (AABB slop
        # around rotated shapes admits more than the touching ~6/body);
        # 16/body gives ~13% headroom so auto_grow's re-trace (a full
        # recompile, minutes at 10k+) never fires on the north-star scene —
        # grow-on-overflow remains the backstop for denser piles
        max_pairs = max(256, min(16 * n, 1 << 19))
    max_pairs = min(max_pairs, state.contacts.key.shape[0])
    kw.setdefault("bucket_cap", max(512, max_pairs // 2))
    # live contact points run ~0.75 per live pair on settled piles (4 is
    # the padded max); 1x pairs is generous and the contact_rows overflow
    # counter flags any scene that needs more. Every solver-phase gather
    # scales with this width (measured ~6 ns per gathered index).
    kw.setdefault("max_rows", max_pairs)
    has_sr = bool((np.asarray(state.spin_friction)[valid] > 0).any()
                  or (np.asarray(state.roll_friction)[valid] > 0).any()
                  or (np.asarray(state.mix_table.vals)[:, 2:4] > 0).any())
    kw.setdefault("has_spin_roll", has_sr)
    kw.setdefault("has_joints", bool(np.asarray(state.joints.valid).any()))
    return SceneMeta(types_present=present, max_pairs=max_pairs, **kw)


class World:
    """Owns the device state and drives the jitted step."""

    def __init__(self, state: WorldState, settings: Settings = Settings(),
                 meta: Optional[SceneMeta] = None):
        self.state = state
        self.settings = settings
        self.meta = meta or derive_meta(state)
        self._accumulator = 0.0
        self._last_time: Optional[float] = None
        # grow-on-overflow policy (SURVEY §7 hard part 5): when a step
        # reports a nonzero capacity-truncation counter, bump the capacity
        # host-side between steps (one re-trace) instead of silently
        # truncating forever. Checked after every step_n batch and every
        # GROW_CHECK_PERIOD-th step() (reading the counters forces a sync,
        # so per-step checking would serialize the dispatch pipeline).
        self.auto_grow = True
        self._step_calls = 0
    GROW_CHECK_PERIOD = 16
    GROW_FACTOR = 1.3

    # -- stepping -------------------------------------------------------
    def step(self, n: int = 1):
        """Advance n fixed-dt steps (reference: edyn::step_simulation)."""
        for _ in range(n):
            self.state = physics_step(self.state, self.settings, self.meta)
            self._step_calls += 1
            if self.auto_grow and self._step_calls % self.GROW_CHECK_PERIOD == 0:
                self._maybe_grow()
        return self

    def step_n(self, n: int, donate: bool = False):
        """Advance n fixed-dt steps as ONE on-device program (lax.fori_loop
        over the step; n is dynamic, so every trip count shares one compile).
        Removes the per-step host dispatch + output copy of ``step`` — use
        for headless batches (benchmarks, fast-forward, server catch-up).

        ``donate=True`` additionally donates the input state buffers; only
        safe when nothing else holds references to this world's previous
        state arrays (e.g. published snapshots) AND no two state leaves
        alias the same buffer (a freshly built world's identical zero
        columns may — step once without donation first)."""
        from ..simulation.stepper import physics_step_n, physics_step_n_donated
        fn = physics_step_n_donated if donate else physics_step_n
        self.state = fn(self.state, jnp.int32(n), self.settings, self.meta)
        if self.auto_grow:
            self._maybe_grow()
        return self

    def _maybe_grow(self):
        """Grow-on-overflow: any nonzero drop counter from the last step
        bumps the corresponding capacity (contact table + SceneMeta) by
        GROW_FACTOR and lets the next step re-trace at the new width. The
        live state is preserved exactly — tables are padded, never rebuilt.
        Window alarms (overflow[3]) are conservative may-have-missed
        signals, not drops, and do not trigger growth."""
        ovf = np.asarray(self.state.overflow)
        if ovf[[0, 1, 2, 4]].max() <= 0:
            return False
        meta = self.meta
        changes = {}
        if ovf[0] > 0 or ovf[4] > 0:  # broadphase pairs / manifold slots
            new_pairs = -(-int(meta.max_pairs * self.GROW_FACTOR) // 128) * 128
            changes["max_pairs"] = new_pairs
            if meta.max_rows is not None:
                changes["max_rows"] = max(
                    meta.max_rows, min(new_pairs, meta.max_rows * 2))
            if meta.bucket_cap is not None:
                changes["bucket_cap"] = max(meta.bucket_cap, new_pairs // 2)
            self.state = dataclasses.replace(
                self.state,
                contacts=grow_contact_table(self.state.contacts, new_pairs),
                edge_pointed=jnp.concatenate([
                    self.state.edge_pointed,
                    jnp.zeros((new_pairs - self.meta.max_pairs,), bool)]))
        if ovf[1] > 0 and meta.bucket_cap is not None:  # narrowphase bucket
            changes["bucket_cap"] = -(-int(max(
                changes.get("bucket_cap", meta.bucket_cap),
                meta.bucket_cap * self.GROW_FACTOR)) // 128) * 128
        if ovf[2] > 0 and meta.max_rows is not None:  # compacted solver rows
            changes["max_rows"] = -(-int(max(
                changes.get("max_rows", meta.max_rows),
                meta.max_rows * self.GROW_FACTOR)) // 128) * 128
        if not changes:
            return False
        self.meta = dataclasses.replace(meta, **changes)
        # clear the counters so an un-regrown dimension doesn't re-trigger
        self.state = dataclasses.replace(
            self.state, overflow=jnp.zeros_like(self.state.overflow))
        return True

    def update(self, elapsed: Optional[float] = None):
        """Variable-rate update with the fixed-dt accumulator (reference:
        stepper_sequential::update, including the max_steps cap that slows the
        simulation instead of spiraling)."""
        now = time.perf_counter()
        if elapsed is None:
            elapsed = 0.0 if self._last_time is None else now - self._last_time
        self._last_time = now
        if self.settings.paused:
            return self
        self._accumulator += elapsed
        num = int(self._accumulator // self.settings.fixed_dt)
        num = min(num, self.settings.max_steps_per_update)
        self._accumulator -= num * self.settings.fixed_dt
        return self.step(num)

    def block_until_ready(self):
        jax.block_until_ready(self.state)
        return self

    # -- settings (reference: edyn.cpp:199-231 setters + refresh) -------
    def set_settings(self, **kw):
        self.settings = self.settings.replace(**kw)
        return self

    # -- accessors ------------------------------------------------------
    def position(self, i):
        return np.asarray(self.state.pos[i])

    def orientation(self, i):
        return np.asarray(self.state.orn[i])

    def linvel(self, i):
        return np.asarray(self.state.linvel[i])

    def angvel(self, i):
        return np.asarray(self.state.angvel[i])

    def is_asleep(self, i) -> bool:
        return bool(self.state.asleep[i])

    def origin(self, i):
        """Shape-origin world position (reference: comp/origin.hpp)."""
        return np.asarray(self.state.origin_pos()[i])

    def set_center_of_mass(self, i, com):
        """Move the body's COM keeping the shape's world pose fixed: the
        stored position shifts to the new world COM and linvel picks up the
        ω×Δr term (reference: edyn::set_center_of_mass →
        apply_center_of_mass, src/edyn/util/rigidbody.cpp:364-543). The
        inertia tensor is NOT changed (matches the reference — pass an
        explicit inertia at creation for a physically different mass
        distribution)."""
        from ..math import quat as _q
        st = self.state
        com = jnp.asarray(com, scalar_dtype())
        orn = st.orn[i]
        origin = st.pos[i] - _q.rotate(orn, st.com[i])
        com_w = origin + _q.rotate(orn, com)
        dlin = vec.cross(st.angvel[i], com_w - st.pos[i])
        self.state = dataclasses.replace(
            st,
            pos=st.pos.at[i].set(com_w),
            com=st.com.at[i].set(com),
            linvel=st.linvel.at[i].add(dlin),
            asleep=st.asleep.at[i].set(False),
            sleep_timer=st.sleep_timer.at[i].set(0.0))
        return self

    def set_roll_direction(self, i, direction):
        """Override the designated object-space rolling axis (reference:
        comp/roll_direction.hpp — auto-assigned from the shape at spawn;
        zero vector = roll isotropically)."""
        self.state = dataclasses.replace(
            self.state,
            roll_axis=self.state.roll_axis.at[i].set(
                jnp.asarray(direction, scalar_dtype())))
        return self

    # -- mutators (reference: util/rigidbody.cpp apply impulses etc.) ---
    def apply_impulse(self, i, impulse, rel_location=(0.0, 0.0, 0.0)):
        """reference: rigidbody_apply_impulse (src/edyn/util/rigidbody.cpp)."""
        imp = jnp.asarray(impulse, scalar_dtype())
        rel = jnp.asarray(rel_location, scalar_dtype())
        st = self.state
        linvel = st.linvel.at[i].add(st.mass_inv[i] * imp)
        Iw = st.inertia_world_inv()[i]
        angvel = st.angvel.at[i].add(Iw @ vec.cross(rel, imp))
        self.state = dataclasses.replace(st, linvel=linvel, angvel=angvel,
                                         asleep=st.asleep.at[i].set(False),
                                         sleep_timer=st.sleep_timer.at[i].set(0.0))
        return self

    def apply_torque_impulse(self, i, torque_impulse):
        st = self.state
        Iw = st.inertia_world_inv()[i]
        angvel = st.angvel.at[i].add(Iw @ jnp.asarray(torque_impulse, scalar_dtype()))
        self.state = dataclasses.replace(st, angvel=angvel,
                                         asleep=st.asleep.at[i].set(False),
                                         sleep_timer=st.sleep_timer.at[i].set(0.0))
        return self

    def set_position(self, i, position, orientation=None):
        """Kinematic/teleport move (reference: update_kinematic_position)."""
        st = self.state
        pos = st.pos.at[i].set(jnp.asarray(position, scalar_dtype()))
        orn = st.orn if orientation is None else st.orn.at[i].set(
            jnp.asarray(orientation, scalar_dtype()))
        self.state = dataclasses.replace(st, pos=pos, orn=orn)
        # a teleported PLANE keeps its world-slab AABB (no box escape fires),
        # so the pair carry must be invalidated host-side
        self._reset_island_stability()
        return self

    def set_velocity(self, i, linvel=None, angvel=None):
        st = self.state
        lv = st.linvel if linvel is None else st.linvel.at[i].set(
            jnp.asarray(linvel, scalar_dtype()))
        av = st.angvel if angvel is None else st.angvel.at[i].set(
            jnp.asarray(angvel, scalar_dtype()))
        self.state = dataclasses.replace(
            st, linvel=lv, angvel=av,
            asleep=st.asleep.at[i].set(False),
            sleep_timer=st.sleep_timer.at[i].set(0.0))
        return self

    # -- runtime constraints (reference: make_constraint on a live registry,
    # util/constraint_util.hpp; constraints are destroyable entities) -------
    def _add_joint(self, **kw) -> int:
        """Write a joint into a free slot of the prebuilt joint table. Ducks
        as WorldBuilder._add_joint so every constraints.api factory works on
        a live World too: ``et.make_hinge_constraint(world, a, b, ...)``.
        The world needs spare joint capacity (make_world(max_joints=...))."""
        jt = self.state.joints
        free = np.where(~np.asarray(jt.valid))[0]
        assert len(free), \
            "joint table full — build the world with a larger max_joints"
        i = int(free[0])
        params = np.zeros((jt.params.shape[1],), np.float64)
        p = np.asarray(kw.get("params", ()), np.float64)
        params[:len(p)] = p
        f = scalar_dtype()
        self.state = dataclasses.replace(self.state, joints=dataclasses.replace(
            jt,
            jtype=jt.jtype.at[i].set(int(kw["jtype"])),
            body_a=jt.body_a.at[i].set(int(kw["body_a"])),
            body_b=jt.body_b.at[i].set(int(kw["body_b"])),
            valid=jt.valid.at[i].set(True),
            pivot_a=jt.pivot_a.at[i].set(jnp.asarray(kw.get("pivot_a", (0, 0, 0)), f)),
            pivot_b=jt.pivot_b.at[i].set(jnp.asarray(kw.get("pivot_b", (0, 0, 0)), f)),
            frame_a=jt.frame_a.at[i].set(jnp.asarray(kw.get("frame_a", (0, 0, 0, 1)), f)),
            frame_b=jt.frame_b.at[i].set(jnp.asarray(kw.get("frame_b", (0, 0, 0, 1)), f)),
            params=jt.params.at[i].set(jnp.asarray(params, f)),
            impulses=jt.impulses.at[i].set(0.0),
            angle=jt.angle.at[i].set(0.0)))
        if not self.meta.has_joints:
            # the joint phases were compiled out of a joint-free world;
            # flipping the static flag re-jits (same cost model as
            # refresh_settings in the reference)
            self.meta = dataclasses.replace(self.meta, has_joints=True)
        # a new graph edge wakes both islands (reference:
        # island_manager on_construct wake)
        self.wake_up(int(kw["body_a"]))
        self.wake_up(int(kw["body_b"]))
        self._reset_island_stability()
        return i

    def destroy_joint(self, j: int):
        """Invalidate a joint and wake its islands (reference: destroying a
        constraint entity wakes the island, island_manager.cpp:74-98)."""
        jt = self.state.joints
        a = int(np.asarray(jt.body_a)[j])
        b = int(np.asarray(jt.body_b)[j])
        self.wake_up(a)
        self.wake_up(b)
        self.state = dataclasses.replace(self.state, joints=dataclasses.replace(
            jt, valid=jt.valid.at[j].set(False),
            jtype=jt.jtype.at[j].set(0),
            impulses=jt.impulses.at[j].set(0.0)))
        self._reset_island_stability()
        return self

    def _reset_island_stability(self):
        """Island-graph edges or pair eligibility changed outside the step
        (joint/body lifecycle, filters): invalidate the steady-state label
        skip so the next 2*RESET_PERIOD steps recompute labels, and the
        broadphase pair-list carry so the next step re-enumerates pairs
        (see stepper.physics_step_impl; pair-list changes driven by MOTION
        are detected on device via box escape, host table edits are not)."""
        self.state = dataclasses.replace(
            self.state,
            island_stable_steps=jnp.zeros((), jnp.int32),
            labels_stable=jnp.zeros((), bool),
            bp_carry_ok=jnp.zeros((), bool))

    def exclude_collision(self, a: int, b: int):
        """Runtime collision exclusion (reference:
        util/exclude_collision.hpp). Appends to both bodies' fixed-width
        exclusion lists."""
        ex = self.state.exclusions
        exn = np.asarray(ex)
        for x, y in ((a, b), (b, a)):
            row = exn[x]
            if y in row:
                continue
            slots = np.where(row < 0)[0]
            assert len(slots), f"exclusion list of body {x} full"
            ex = ex.at[x, int(slots[0])].set(y)
        self.state = dataclasses.replace(self.state, exclusions=ex)
        self._reset_island_stability()  # pair eligibility changed
        return self

    def set_mass(self, i, mass: float):
        """reference: set_rigidbody_mass (util/rigidbody.hpp:149,
        rigidbody.cpp:300-305) — replaces mass only; the inertia tensor is
        deliberately untouched (call set_inertia for that), matching the
        reference exactly."""
        assert mass > 0, "mass must be positive"
        st = self.state
        self.state = dataclasses.replace(
            st, mass_inv=st.mass_inv.at[i].set(1.0 / mass))
        return self

    def set_inertia(self, i, inertia):
        """reference: set_rigidbody_inertia (rigidbody.cpp:307-312). Takes
        the local-space 3x3 inertia tensor (or a diagonal [3])."""
        I = np.asarray(inertia, np.float64)
        if I.ndim == 1:
            I = np.diag(I)
        st = self.state
        self.state = dataclasses.replace(
            st, inertia_inv=st.inertia_inv.at[i].set(
                jnp.asarray(np.linalg.inv(I), scalar_dtype())))
        return self

    def set_friction(self, i, friction: float):
        """reference: set_rigidbody_friction (rigidbody.cpp:314-345). The
        reference patches live manifolds by hand; here contact rows re-mix
        body materials every step (dynamics/solver.py material mixing), so
        updating the body column updates existing contacts on the next
        step."""
        st = self.state
        self.state = dataclasses.replace(
            st, friction=st.friction.at[i].set(friction))
        return self

    def get_gravity(self, i=None):
        """Per-body gravity, or the world default when i is None (reference:
        get_gravity, util/gravity_util.hpp:15)."""
        if i is None:
            return np.asarray(self.settings.gravity)
        return np.asarray(self.state.gravity[i])

    def set_gravity(self, g, i=None):
        """Set one body's gravity, or — like the reference's set_gravity
        (util/gravity_util.hpp:23, src/edyn/util/gravity_util.cpp) — update
        the world default AND every dynamic body currently on it."""
        st = self.state
        g = jnp.asarray(g, scalar_dtype())
        if i is not None:
            self.state = dataclasses.replace(st, gravity=st.gravity.at[i].set(g))
            return self
        old = jnp.asarray(self.settings.gravity, scalar_dtype())
        on_default = (st.kind == KIND_DYNAMIC) & jnp.all(
            st.gravity == old[None, :], axis=-1)
        self.settings = dataclasses.replace(
            self.settings, gravity=tuple(float(x) for x in np.asarray(g)))
        self.state = dataclasses.replace(
            st, gravity=jnp.where(on_default[:, None], g[None, :], st.gravity))
        return self

    def manifold_between(self, a, b) -> dict | None:
        """Contact manifold between two bodies, or None (reference:
        manifold_exists/get_manifold_entity, util/contact_manifold_util.hpp:19-35,
        + contact_manifold_each_point). Returns point positions, normals,
        separations, and accumulated impulses for the live points. The
        normal points towards body_a (reference convention,
        collision_result.hpp:26), where body_a is the lower body index."""
        st = self.state
        man = st.contacts
        lo, hi = (a, b) if a < b else (b, a)
        key = np.uint64(lo) * np.uint64(st.capacity) + np.uint64(hi)
        # the table is slot-stable (not key-sorted): host-side exact match
        keys = np.asarray(man.key).astype(np.uint64)
        hits = np.nonzero((keys == key) & np.asarray(man.valid))[0]
        if hits.size == 0:
            return None
        idx = int(hits[0])
        pv = np.asarray(man.point_valid[idx])
        if not pv.any():
            return None
        from ..math import quat as quat_mod
        ppos = np.asarray(st.origin_pos()[man.body_a[idx]]) + np.asarray(
            quat_mod.rotate(st.orn[man.body_a[idx]], man.pivot_a[idx]))
        # attachment: 0 = world-space normal, 1 = rotates with A, 2 = with B
        # (same decode as dynamics/solver.py:283-284)
        att = man.normal_attachment[idx][:, None]
        ln = man.local_normal[idx]
        nrm = np.asarray(jnp.where(
            att == 1, quat_mod.rotate(st.orn[man.body_a[idx]], ln),
            jnp.where(att == 2, quat_mod.rotate(st.orn[man.body_b[idx]], ln),
                      ln)))
        return {"body_a": int(man.body_a[idx]), "body_b": int(man.body_b[idx]),
                "num_points": int(pv.sum()),
                "point_valid": pv,
                "position": ppos,
                "normal": nrm,
                "distance": np.asarray(man.distance[idx]),
                "normal_impulse": np.asarray(man.normal_impulse[idx]),
                "friction_impulse": np.asarray(man.friction_impulse[idx])}

    def manifold_exists(self, a, b) -> bool:
        """reference: manifold_exists (util/contact_manifold_util.hpp:19)."""
        return self.manifold_between(a, b) is not None

    def step_with_events(self, n: int = 1):
        """Step and collect contact started/ended pairs (reference: the
        contact_started/ended EnTT signals, Design.md:135-139)."""
        from ..collision.events import contact_events
        prev = self.state
        self.step(n)
        return contact_events(prev, self.state)

    def overflow_counters(self) -> dict:
        """Last-step capacity-truncation counters (all zero = nothing was
        silently dropped). Raise the corresponding capacity (max_pairs /
        bucket_cap / max_rows) when any is non-zero."""
        ovf = np.asarray(self.state.overflow)
        return {"broadphase_pairs": int(ovf[0]),
                "narrowphase_candidates": int(ovf[1]),
                "contact_rows": int(ovf[2]),
                "broadphase_window_alarms": int(ovf[3]),
                "manifold_slots": int(ovf[4]) if ovf.shape[0] > 4 else 0}

    def query_aabb(self, lo, hi, include_non_procedural=True):
        """reference: include/edyn/collision/query_aabb.hpp."""
        from ..collision.events import query_aabb
        return query_aabb(self.state, lo, hi, include_non_procedural)

    def set_kind(self, i, kind, mass: float | None = None):
        """Change rigid body kind (reference: rigidbody_set_kind,
        src/edyn/util/rigidbody.cpp / test_change_rigidbody_kind.cpp)."""
        from ..shapes.inertia import moment_of_inertia
        st = self.state
        updates = {"kind": st.kind.at[i].set(int(kind)),
                   "asleep": st.asleep.at[i].set(False),
                   "sleep_timer": st.sleep_timer.at[i].set(0.0)}
        if kind == 0:  # dynamic: restore mass properties
            assert mass is not None and mass > 0, \
                "becoming dynamic requires a mass"
            stype = int(st.shape_type[i])
            params = np.asarray(st.shape_params[i])
            I = np.diag(moment_of_inertia(stype, params, mass))
            updates["mass_inv"] = st.mass_inv.at[i].set(1.0 / mass)
            updates["inertia_inv"] = st.inertia_inv.at[i].set(
                jnp.asarray(np.linalg.inv(I), scalar_dtype()))
            updates["gravity"] = st.gravity.at[i].set(
                jnp.asarray(self.settings.gravity, scalar_dtype()))
        else:
            updates["mass_inv"] = st.mass_inv.at[i].set(0.0)
            updates["inertia_inv"] = st.inertia_inv.at[i].set(jnp.zeros((3, 3)))
            updates["linvel"] = st.linvel.at[i].set(0.0) if kind == 2 else st.linvel
            updates["gravity"] = st.gravity.at[i].set(0.0)
        self.state = dataclasses.replace(st, **updates)
        # kind changes island-graph connectivity (only dynamic bodies
        # connect islands) without touching the pair list, so the
        # steady-state label skip must be invalidated (ADVICE r4)
        self._reset_island_stability()
        return self

    def set_shape(self, i, shape):
        """Swap a body's (simple) shape at runtime (reference:
        rigidbody_set_shape / test_set_shape.cpp). The body's mass is kept;
        inertia is recomputed."""
        from ..shapes.inertia import moment_of_inertia
        st = self.state
        stype, params = shape.pack()
        from ..shapes.params import shape_roll_direction
        updates = {
            "shape_type": st.shape_type.at[i].set(int(stype)),
            "shape_params": st.shape_params.at[i].set(
                jnp.asarray(params, scalar_dtype())),
            # reference keeps roll_direction in sync with the shape
            # (rigidbody_set_shape, rigidbody.cpp:450-466)
            "roll_axis": st.roll_axis.at[i].set(jnp.asarray(
                shape_roll_direction(int(stype), params), scalar_dtype())),
        }
        minv = float(st.mass_inv[i])
        if minv > 0:
            mass = 1.0 / minv
            I = np.diag(moment_of_inertia(int(stype), params, mass))
            updates["inertia_inv"] = st.inertia_inv.at[i].set(
                jnp.asarray(np.linalg.inv(I), scalar_dtype()))
        from .spawn import update_convex_row
        updates["convex"] = update_convex_row(st.convex, i, int(stype), params)
        # clear this body's manifolds — existing contact points are invalid
        # for the new shape (reference: rigidbody_set_shape
        # clear_contact_manifold_tag, src/edyn/util/rigidbody.cpp:488-495)
        man = st.contacts
        hit = ((man.body_a == i) | (man.body_b == i)) & man.valid
        updates["contacts"] = dataclasses.replace(
            man,
            point_valid=jnp.where(hit[:, None], False, man.point_valid),
            normal_impulse=jnp.where(hit[:, None], 0.0, man.normal_impulse),
            friction_impulse=jnp.where(hit[:, None, None], 0.0,
                                       man.friction_impulse),
            spin_impulse=jnp.where(hit[:, None], 0.0, man.spin_impulse),
            roll_impulse=jnp.where(hit[:, None, None], 0.0, man.roll_impulse),
            lifetime=jnp.where(hit[:, None], 0, man.lifetime))
        self.state = dataclasses.replace(st, **updates)
        self.meta = dataclasses.replace(
            self.meta,
            types_present=self.meta.types_present | {int(stype)})
        # manifold points were cleared without a pair-list change: the
        # pointed mask shifts under the steady-state label skip (ADVICE r4)
        self._reset_island_stability()
        return self

    def spawn(self, def_, poly_index=None) -> int:
        """Create a rigid body in a free slot at runtime (reference:
        make_rigidbody on a live registry)."""
        from .spawn import spawn_rigidbody
        self.state, idx = spawn_rigidbody(self.state, def_,
                                          poly_index=poly_index)
        stype = int(self.state.shape_type[idx])
        if stype not in self.meta.types_present:
            self.meta = dataclasses.replace(
                self.meta, types_present=self.meta.types_present | {stype})
        m = def_.material
        if m is not None and (m.spin_friction > 0 or m.roll_friction > 0) \
                and not self.meta.has_spin_roll:
            self.meta = dataclasses.replace(self.meta, has_spin_roll=True)
        self._reset_island_stability()
        return idx

    def destroy(self, i):
        """reference: clear_rigidbody."""
        from .spawn import destroy_rigidbody
        self.state = destroy_rigidbody(self.state, i)
        self._reset_island_stability()
        return self

    def raycast(self, p0, p1):
        """Cast one ray or a batch (reference: edyn::raycast). Returns dict
        with fraction/entity/normal plus feature detail (feature kind,
        sub_index, compound child_index — raycast.FEAT_*); arrays for a
        batch, scalars for one."""
        from ..collision.raycast import raycast as _raycast
        p0 = np.atleast_2d(np.asarray(p0, scalar_dtype()))
        p1 = np.atleast_2d(np.asarray(p1, scalar_dtype()))
        single = p0.shape[0] == 1
        out = _raycast(self.state, jnp.asarray(p0), jnp.asarray(p1))
        out = {k: np.asarray(v) for k, v in out.items()}
        if single:
            return {"fraction": float(out["fraction"][0]),
                    "entity": int(out["entity"][0]),
                    "normal": out["normal"][0],
                    "feature": int(out["feature"][0]),
                    "sub_index": int(out["sub_index"][0]),
                    "child_index": int(out["child_index"][0])}
        return out

    def wake_set(self, indices):
        if not indices:
            return self
        idx = jnp.asarray(sorted(indices), jnp.int32)
        st = self.state
        self.state = dataclasses.replace(
            st, asleep=st.asleep.at[idx].set(False),
            sleep_timer=st.sleep_timer.at[idx].set(0.0))
        return self

    def put_to_sleep(self, indices=None):
        """Force bodies (default: every dynamic body) asleep NOW: velocities
        zeroed, sleep timer saturated. The island update keeps them asleep
        as long as their whole island stays quiet — same invariant the
        reference's timer-driven sleep converges to (island_manager.cpp
        put_islands_to_sleep); this is the fast-forward of it."""
        from ..config import ISLAND_TIME_TO_SLEEP
        st = self.state
        if indices is None:
            mask = st.is_dynamic
        else:
            mask = jnp.zeros((st.capacity,), bool).at[
                jnp.asarray(sorted(indices), jnp.int32)].set(True)
            mask = mask & st.is_dynamic
        self.state = dataclasses.replace(
            st,
            asleep=jnp.where(mask, True, st.asleep),
            sleep_timer=jnp.where(mask, ISLAND_TIME_TO_SLEEP, st.sleep_timer),
            linvel=jnp.where(mask[:, None], 0.0, st.linvel),
            angvel=jnp.where(mask[:, None], 0.0, st.angvel))
        return self

    def wake_up(self, i):
        """Wake the body's whole island (reference: wake_up_island).

        Membership comes from an exact host-side union-find over the live
        contact/joint edges, NOT the on-device labels — those fragment for
        1-2 steps after each RESET_PERIOD re-seed (dynamics/islands.py)."""
        from ..dynamics.islands import exact_island_mask
        st = self.state
        members = exact_island_mask(st, [int(i)])
        self.state = dataclasses.replace(
            st,
            asleep=jnp.where(members, False, st.asleep),
            sleep_timer=jnp.where(members, 0.0, st.sleep_timer))
        return self


def make_world(builder: WorldBuilder, settings: Settings = Settings(),
               capacity: Optional[int] = None, max_pairs: Optional[int] = None,
               **finalize_kw) -> World:
    """Finalize a builder into a stepping world (reference: edyn::attach).

    The manifold table is sized to max_pairs — the pair list and manifold
    table share the same (sorted-by-key) layout."""
    if max_pairs is None:
        n = len(builder.defs)
        # keep in sync with derive_meta: 16/body covers the measured
        # 14.2/body settled-pile demand with headroom (no mid-run re-trace)
        max_pairs = max(256, min(16 * n, 1 << 19))
    finalize_kw.setdefault("max_manifolds", max_pairs)
    # bodies whose def didn't pin a gravity follow the world settings
    # (reference: rigidbody_def defaults to edyn::get_gravity(registry))
    if builder.default_gravity is None:
        builder.default_gravity = np.asarray(settings.gravity, np.float64)
    state = builder.finalize(capacity=capacity, **finalize_kw)
    w = World(state, settings, derive_meta(state, max_pairs))
    # per-component replication policies for user components (reference:
    # register_external network fidelity; replication/exporter.py)
    w.user_component_policies = dict(builder.user_component_policies)
    return w
