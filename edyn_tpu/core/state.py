"""The world state: a fixed-capacity structure-of-arrays pytree.

TPU-native replacement for the reference's EnTT registry + component structs
(SURVEY §2.2; include/edyn/comp/*.hpp). Every component becomes a column of a
dataclass pytree; tags become boolean masks; entity ids become array slots.
The whole world steps as one jitted function over this pytree — there is no
per-entity host work (reference analogue: the simulation worker's registry,
src/edyn/simulation/simulation_worker.cpp:62-497).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MAX_CONTACTS

# rigidbody kinds (reference: include/edyn/util/rigidbody.hpp:16-25)
KIND_DYNAMIC = 0
KIND_KINEMATIC = 1
KIND_STATIC = 2

MAX_EXCLUSIONS = 16  # reference: comp/collision_exclusion.hpp max_exclusions
MAX_JOINT_ROWS = 24  # generic 6-DOF x (limit + bump stop + spring + friction) rows


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class ContactTable:
    """Persistent 4-point contact manifolds, one row per body pair.

    Reference analogue: contact_manifold + the 6 contact_point components
    (include/edyn/collision/contact_manifold.hpp:14-29,
    include/edyn/collision/contact_point.hpp:17-66). ``key`` is the sorted
    pair key ``a * N + b`` used for sort/searchsorted persistence matching
    (replaces contact_manifold_map, include/edyn/collision/contact_manifold_map.hpp).
    """
    key: jnp.ndarray            # [M] uint32, INVALID_KEY when invalid.
                                # SLOT-STABLE: a manifold keeps its slot for
                                # its whole life (persistent data never moves;
                                # a steady pair set costs zero carry work).
    body_a: jnp.ndarray         # [M] int32
    body_b: jnp.ndarray         # [M] int32
    valid: jnp.ndarray          # [M] bool
    # sorted view, rebuilt each step from the broadphase key list: maps the
    # ascending admitted pair keys to their slots (M = not allocated). This
    # replaces the reference's contact_manifold_map hash lookup.
    sort_key: jnp.ndarray       # [M] uint32 ascending, INVALID_KEY pad
    sort_slot: jnp.ndarray      # [M] int32, == M when the key has no slot
    sort_pvalid: jnp.ndarray    # [M] bool — pair_valid of each sorted entry
    point_valid: jnp.ndarray    # [M,4] bool
    pivot_a: jnp.ndarray        # [M,4,3] contact point in A's object space
    pivot_b: jnp.ndarray        # [M,4,3] contact point in B's object space
    local_normal: jnp.ndarray   # [M,4,3] normal in attachment body's object space
    normal_attachment: jnp.ndarray  # [M,4] int32: 0 none, 1 A, 2 B
    distance: jnp.ndarray       # [M,4] signed separation along normal
    lifetime: jnp.ndarray       # [M,4] int32 steps alive
    normal_impulse: jnp.ndarray    # [M,4]
    friction_impulse: jnp.ndarray  # [M,4,2]
    spin_impulse: jnp.ndarray      # [M,4]
    roll_impulse: jnp.ndarray      # [M,4,2]
    # per-point material scale from the surface feature hit (per-triangle
    # mesh materials, reference Design.md:199-203); 1.0 elsewhere
    friction_scale: jnp.ndarray    # [M,4]
    restitution_scale: jnp.ndarray  # [M,4]

    @staticmethod
    def zeros(M: int) -> "ContactTable":
        return ContactTable(
            key=jnp.full((M,), jnp.iinfo(jnp.uint32).max, jnp.uint32),
            body_a=jnp.zeros((M,), jnp.int32),
            body_b=jnp.zeros((M,), jnp.int32),
            valid=jnp.zeros((M,), bool),
            sort_key=jnp.full((M,), jnp.iinfo(jnp.uint32).max, jnp.uint32),
            sort_slot=jnp.full((M,), M, jnp.int32),
            sort_pvalid=jnp.zeros((M,), bool),
            point_valid=jnp.zeros((M, MAX_CONTACTS), bool),
            pivot_a=jnp.zeros((M, MAX_CONTACTS, 3)),
            pivot_b=jnp.zeros((M, MAX_CONTACTS, 3)),
            local_normal=jnp.zeros((M, MAX_CONTACTS, 3)),
            normal_attachment=jnp.zeros((M, MAX_CONTACTS), jnp.int32),
            distance=jnp.zeros((M, MAX_CONTACTS)),
            lifetime=jnp.zeros((M, MAX_CONTACTS), jnp.int32),
            normal_impulse=jnp.zeros((M, MAX_CONTACTS)),
            friction_impulse=jnp.zeros((M, MAX_CONTACTS, 2)),
            spin_impulse=jnp.zeros((M, MAX_CONTACTS)),
            roll_impulse=jnp.zeros((M, MAX_CONTACTS, 2)),
            friction_scale=jnp.ones((M, MAX_CONTACTS)),
            restitution_scale=jnp.ones((M, MAX_CONTACTS)),
        )


def grow_contact_table(tab: "ContactTable", newM: int) -> "ContactTable":
    """Pad the manifold table to ``newM`` slots, preserving every live
    manifold in place (slots are stable). Part of the grow-on-overflow
    policy (World._maybe_grow): the pair-capacity analogue of the
    reference's unbounded manifold creation (broadphase.cpp:136-155)."""
    import dataclasses as _dc_mod
    M = tab.key.shape[0]
    if newM <= M:
        return tab
    pad = newM - M
    INV = jnp.uint32(jnp.iinfo(jnp.uint32).max)

    def ext(x, fill):
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)])

    return _dc_mod.replace(
        tab,
        key=ext(tab.key, INV),
        body_a=ext(tab.body_a, 0),
        body_b=ext(tab.body_b, 0),
        valid=ext(tab.valid, False),
        # the sorted view's "no slot" sentinel is M — remap to newM
        sort_key=ext(tab.sort_key, INV),
        sort_slot=ext(jnp.where(tab.sort_slot >= M, newM, tab.sort_slot),
                      newM),
        sort_pvalid=ext(tab.sort_pvalid, False),
        point_valid=ext(tab.point_valid, False),
        pivot_a=ext(tab.pivot_a, 0.0),
        pivot_b=ext(tab.pivot_b, 0.0),
        local_normal=ext(tab.local_normal, 0.0),
        normal_attachment=ext(tab.normal_attachment, 0),
        distance=ext(tab.distance, 0.0),
        lifetime=ext(tab.lifetime, 0),
        normal_impulse=ext(tab.normal_impulse, 0.0),
        friction_impulse=ext(tab.friction_impulse, 0.0),
        spin_impulse=ext(tab.spin_impulse, 0.0),
        roll_impulse=ext(tab.roll_impulse, 0.0),
        friction_scale=ext(tab.friction_scale, 1.0),
        restitution_scale=ext(tab.restitution_scale, 1.0),
    )


@_dc
class JointTable:
    """Non-contact constraints (the reference's 10 constraint types,
    include/edyn/constraints/constraint.hpp:23-34) as one padded SoA table.
    ``params`` packs per-type fields; ``impulses`` stores warm-start values
    per conceptual row."""
    jtype: jnp.ndarray      # [J] int32 (JointType enum; 0 = none)
    body_a: jnp.ndarray     # [J] int32
    body_b: jnp.ndarray     # [J] int32
    valid: jnp.ndarray      # [J] bool
    pivot_a: jnp.ndarray    # [J,3]
    pivot_b: jnp.ndarray    # [J,3]
    frame_a: jnp.ndarray    # [J,4] quat frame on A (hinge/cv/generic/cone)
    frame_b: jnp.ndarray    # [J,4]
    params: jnp.ndarray     # [J,60] type-specific packed parameters
    impulses: jnp.ndarray   # [J,MAX_JOINT_ROWS] warm-start impulses
    angle: jnp.ndarray      # [J] tracked continuous twist/hinge angle
                            # (reference: hinge/cvjoint update_angle state)

    @staticmethod
    def zeros(J: int) -> "JointTable":
        ident = jnp.zeros((J, 4)).at[:, 3].set(1.0)
        return JointTable(
            jtype=jnp.zeros((J,), jnp.int32),
            body_a=jnp.zeros((J,), jnp.int32),
            body_b=jnp.zeros((J,), jnp.int32),
            valid=jnp.zeros((J,), bool),
            pivot_a=jnp.zeros((J, 3)),
            pivot_b=jnp.zeros((J, 3)),
            frame_a=ident,
            frame_b=ident,
            params=jnp.zeros((J, 60)),
            impulses=jnp.zeros((J, MAX_JOINT_ROWS)),
            angle=jnp.zeros((J,)),
        )


@_dc
class MixTable:
    """Material-mixing pair override table (reference: material_mix_table,
    include/edyn/dynamics/material_mixing.hpp:36-81): contacts whose two
    bodies carry these material ids use the override instead of the default
    mix functions."""
    ids: jnp.ndarray   # [P,2] int32 material id pairs (unordered)
    vals: jnp.ndarray  # [P,6] restitution, friction, spin, roll, stiffness, damping

    @staticmethod
    def empty() -> "MixTable":
        return MixTable(ids=jnp.full((0, 2), -1, jnp.int32),
                        vals=jnp.zeros((0, 6)))


@_dc
class PolyTable:
    """Device-side polyhedron side table (see shapes.params.PolyhedronTable)."""
    verts: jnp.ndarray
    vert_mask: jnp.ndarray
    face_normals: jnp.ndarray
    face_mask: jnp.ndarray
    edge_dirs: jnp.ndarray
    edge_mask: jnp.ndarray

    @staticmethod
    def empty() -> "PolyTable":
        z3 = jnp.zeros((0, 1, 3))
        z1 = jnp.zeros((0, 1), bool)
        return PolyTable(z3, z1, z3, z1, z3, z1)


@_dc
class WorldState:
    """Everything about the simulated world, as one pytree.

    Columns map 1:1 to reference components (SURVEY §2.2):
    pos/orn (position/orientation), linvel/angvel, mass_inv,
    inertia_inv (local-space inverse inertia tensor; world-space recomputed on
    the fly, reference comp/inertia.hpp inertia_world_inv), material columns
    (comp/material.hpp:15-31), kind+masks (comp/tag.hpp), collision filter
    (comp/collision_filter.hpp), shape_type/params (shapes variant +
    comp/shape_index.hpp), AABBs (comp/aabb.hpp), islands & sleeping
    (comp/island.hpp, sleeping_tag).
    """
    # kinematic state
    pos: jnp.ndarray          # [N,3]
    orn: jnp.ndarray          # [N,4] xyzw
    linvel: jnp.ndarray       # [N,3]
    angvel: jnp.ndarray       # [N,3]
    # mass properties
    mass_inv: jnp.ndarray     # [N]
    inertia_inv: jnp.ndarray  # [N,3,3] local-space inverse inertia (about COM)
    # center of mass offset in the SHAPE (origin) frame; ``pos`` is the world
    # COM, the shape sits at origin = pos - R*com (reference:
    # comp/center_of_mass.hpp, comp/origin.hpp, sys/update_origins.cpp)
    com: jnp.ndarray          # [N,3]
    # material (has_material=False => sensor: detects but doesn't respond)
    restitution: jnp.ndarray  # [N]
    friction: jnp.ndarray     # [N]
    spin_friction: jnp.ndarray
    roll_friction: jnp.ndarray
    stiffness: jnp.ndarray
    damping: jnp.ndarray
    has_material: jnp.ndarray  # [N] bool
    material_id: jnp.ndarray   # [N] int32 (material-mixing pair table id)
    gravity: jnp.ndarray      # [N,3]
    # classification
    kind: jnp.ndarray         # [N] int32 (KIND_*)
    valid: jnp.ndarray        # [N] bool — slot allocated
    sleeping_disabled: jnp.ndarray  # [N] bool
    networked: jnp.ndarray    # [N] bool
    # collision filtering
    group: jnp.ndarray        # [N] uint32
    mask: jnp.ndarray         # [N] uint32
    exclusions: jnp.ndarray   # [N,MAX_EXCLUSIONS] int32, -1 empty
    # shape
    shape_type: jnp.ndarray   # [N] int32
    shape_params: jnp.ndarray  # [N,4]
    shape_index: jnp.ndarray  # [N] int32 index into side tables
    # derived
    aabb_min: jnp.ndarray     # [N,3]
    aabb_max: jnp.ndarray     # [N,3]
    # carried broadphase ("fat") AABB: tight AABB inflated by
    # config.BROADPHASE_FAT_MARGIN, re-seated only when the tight AABB
    # escapes it (reference: dynamic_tree fat AABBs + move(),
    # dynamic_tree.cpp:60-77). Pair generation reads THESE, so sub-margin
    # jitter never changes the pair set and settled islands can sleep.
    # Reversed bounds (min > max) mean "unseated" — the next step seats them.
    bp_aabb_min: jnp.ndarray  # [N,3]
    bp_aabb_max: jnp.ndarray  # [N,3]
    # designated rolling axis in object space (zero = roll isotropically).
    # Set from the shape at spawn/set_shape (cylinders/capsules roll about
    # their disc axis; reference: comp/roll_direction.hpp,
    # util/rigidbody.cpp:119-127 shape_rolling_direction); rolling-friction
    # row axes are scaled by their projection onto this axis so off-axis
    # "rolling" is not damped (contact_extras_constraint.cpp:44-56)
    roll_axis: jnp.ndarray    # [N,3]
    # islands & sleeping (mask-based; SURVEY §5.7)
    island_id: jnp.ndarray    # [N] int32
    sleep_timer: jnp.ndarray  # [N]
    asleep: jnp.ndarray       # [N] bool
    # island steady-state skip: previous step's contact-edge mask (valid
    # manifolds holding points) and whether the label propagation reached a
    # fixpoint on an unchanged edge set. When the pair list is unchanged
    # (update_slots fast path) AND the pointed mask matches AND labels are
    # converged, the whole label-propagation block is skipped under
    # lax.cond — the reference's "sleeping islands cost nothing" analogue
    # for the island phase itself (island_manager keeps its graph
    # incrementally; recompute only happens on edge events).
    edge_pointed: jnp.ndarray   # [M] bool
    labels_stable: jnp.ndarray  # [] bool — last full propagation converged
    island_stable_steps: jnp.ndarray  # [] int32 — consecutive steps with an
                                # unchanged edge set (pair list + pointed
                                # mask); host lifecycle mutators reset it
    # broadphase pair-list carry: True when contacts.sort_key/sort_pvalid
    # hold the exact pair list of the current admission boxes. When no box
    # re-seats in a step (no body escaped its carried fat box — every
    # settled/sleeping step), the pair set provably cannot change and the
    # whole broadphase is skipped under lax.cond, reusing the sorted list
    # (the reference analogue: dynamic_tree::move() returns false for
    # non-escaping AABBs and no re-query happens, dynamic_tree.cpp:60-77).
    # Host mutators that change pair eligibility outside the boxes
    # (spawn/destroy/set_kind/set_shape/exclusions/filters) reset it.
    bp_carry_ok: jnp.ndarray    # [] bool
    # sub-tables
    contacts: ContactTable
    joints: JointTable
    poly: PolyTable
    mesh: "object"  # MeshTable (shapes.mesh) — static trimesh side tables
    convex: "object"  # ConvexTable (shapes.convex) — unified per-body cloud
    compound: "object"  # CompoundTable (shapes.compound) — child lists
    mix_table: MixTable
    # user/external components (reference: register_external_components,
    # replication/register_external.hpp:28-67): named [N,...] columns that
    # ride the pytree through the step untouched, replicate over the wire,
    # and serve as input-history targets
    user: dict
    # clock
    step_count: jnp.ndarray   # [] int32
    sim_time: jnp.ndarray     # [] float32
    # capacity-overflow counters, refreshed each step (silent truncation is
    # surfaced, not swallowed): [0] broadphase pairs dropped, [1] narrowphase
    # bucket candidates dropped, [2] solver contact rows dropped,
    # [3] sweep-broadphase beyond-window alarms (conservative, may be benign)
    overflow: jnp.ndarray     # [5] int32: broadphase pairs, narrowphase
                              # candidates, contact rows, sweep alarms,
                              # manifold slots

    # --- convenience ---
    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def is_dynamic(self):
        return (self.kind == KIND_DYNAMIC) & self.valid

    @property
    def is_static(self):
        return (self.kind == KIND_STATIC) & self.valid

    @property
    def is_kinematic(self):
        return (self.kind == KIND_KINEMATIC) & self.valid

    @property
    def awake_dynamic(self):
        return self.is_dynamic & ~self.asleep

    @staticmethod
    def zeros(N: int, M: int, J: int, poly: PolyTable | None = None,
              mesh=None, convex=None, compound=None) -> "WorldState":
        from ..shapes.mesh import MeshTable
        from ..shapes.convex import ConvexTable
        from ..shapes.compound import CompoundTable
        ident = jnp.zeros((N, 4)).at[:, 3].set(1.0)
        # Explicit dtype on every float fill: a weak-typed leaf (plain-float
        # jnp.full) gives the fresh state a different jit signature than the
        # stepped state, forcing a full retrace of physics_step on step 2.
        from ..config import scalar_dtype
        f = scalar_dtype()
        return WorldState(
            pos=jnp.zeros((N, 3)),
            orn=ident,
            linvel=jnp.zeros((N, 3)),
            angvel=jnp.zeros((N, 3)),
            mass_inv=jnp.zeros((N,)),
            inertia_inv=jnp.zeros((N, 3, 3)),
            com=jnp.zeros((N, 3)),
            restitution=jnp.zeros((N,)),
            friction=jnp.full((N,), 0.5, f),
            spin_friction=jnp.zeros((N,)),
            roll_friction=jnp.zeros((N,)),
            stiffness=jnp.full((N,), 1e10, f),
            damping=jnp.full((N,), 1e10, f),
            has_material=jnp.zeros((N,), bool),
            material_id=jnp.full((N,), -1, jnp.int32),
            gravity=jnp.zeros((N, 3)),
            kind=jnp.full((N,), KIND_STATIC, jnp.int32),
            valid=jnp.zeros((N,), bool),
            sleeping_disabled=jnp.zeros((N,), bool),
            networked=jnp.zeros((N,), bool),
            group=jnp.full((N,), 0xFFFFFFFF, jnp.uint32),
            mask=jnp.full((N,), 0xFFFFFFFF, jnp.uint32),
            exclusions=jnp.full((N, MAX_EXCLUSIONS), -1, jnp.int32),
            shape_type=jnp.zeros((N,), jnp.int32),
            shape_params=jnp.zeros((N, 4)),
            shape_index=jnp.zeros((N,), jnp.int32),
            aabb_min=jnp.zeros((N, 3)),
            aabb_max=jnp.zeros((N, 3)),
            bp_aabb_min=jnp.full((N, 3), 1e30, f),
            bp_aabb_max=jnp.full((N, 3), -1e30, f),
            roll_axis=jnp.zeros((N, 3)),
            island_id=jnp.full((N,), -1, jnp.int32),
            sleep_timer=jnp.zeros((N,)),
            asleep=jnp.zeros((N,), bool),
            edge_pointed=jnp.zeros((M,), bool),
            labels_stable=jnp.zeros((), bool),
            island_stable_steps=jnp.zeros((), jnp.int32),
            bp_carry_ok=jnp.zeros((), bool),
            contacts=ContactTable.zeros(M),
            joints=JointTable.zeros(J),
            poly=poly if poly is not None else PolyTable.empty(),
            mesh=mesh if mesh is not None else MeshTable.empty(),
            convex=convex if convex is not None else ConvexTable.empty(N),
            compound=compound if compound is not None else CompoundTable.empty(),
            mix_table=MixTable.empty(),
            user={},
            step_count=jnp.zeros((), jnp.int32),
            sim_time=jnp.zeros(()),
            overflow=jnp.zeros((5,), jnp.int32),
        )

    def origin_pos(self):
        """Shape-origin world positions: pos - R*com (reference:
        sys/update_origins.cpp — recomputed on the fly, never stored)."""
        from ..math import quat
        return self.pos - quat.rotate(self.orn, self.com)

    def inertia_world_inv(self):
        """World-space inverse inertia R I_l^-1 R^T per body (reference:
        sys/update_inertias.hpp)."""
        from ..math import quat
        R = quat.to_matrix(self.orn)
        return jnp.einsum("...ij,...jk,...lk->...il", R, self.inertia_inv, R)
