"""Scene building: rigidbody_def -> SoA world state.

Mirrors the reference's scene-building API (include/edyn/util/rigidbody.hpp:29-75
rigidbody_def; src/edyn/util/rigidbody.cpp make_rigidbody) on the host side in
numpy, then freezes into a device-resident ``WorldState``. Capacity is fixed at
finalize; bodies added later claim free slots functionally.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import scalar_dtype
from ..shapes.params import (
    ShapeType, SphereShape, BoxShape, CapsuleShape, CylinderShape, PlaneShape,
    PolyhedronShape, CompoundShape, MeshShape, pack_polyhedra,
)
from ..shapes.inertia import moment_of_inertia, polyhedron_inertia
from .state import (
    WorldState, ContactTable, JointTable, PolyTable,
    KIND_DYNAMIC, KIND_KINEMATIC, KIND_STATIC, MAX_EXCLUSIONS,
)

ALL_GROUPS = 0xFFFFFFFF


@dataclasses.dataclass
class Material:
    """Reference: include/edyn/comp/material.hpp:15-31."""
    restitution: float = 0.0
    friction: float = 0.5
    spin_friction: float = 0.0
    roll_friction: float = 0.0
    stiffness: float = 1e10   # >= LARGE_SCALAR => rigid contact
    damping: float = 1e10
    id: int = -1              # material-mixing pair-table id


@dataclasses.dataclass
class RigidBodyDef:
    """Reference: rigidbody_def (include/edyn/util/rigidbody.hpp:29-75)."""
    kind: int = KIND_DYNAMIC
    position: Sequence[float] = (0.0, 0.0, 0.0)
    orientation: Sequence[float] = (0.0, 0.0, 0.0, 1.0)  # xyzw
    mass: float = 1.0
    inertia: Optional[np.ndarray] = None  # 3x3 or diag-3; computed from shape if None
    linvel: Sequence[float] = (0.0, 0.0, 0.0)
    angvel: Sequence[float] = (0.0, 0.0, 0.0)
    center_of_mass: Optional[Sequence[float]] = None
    gravity: Optional[Sequence[float]] = None
    shape: object = None  # one of the *Shape descriptors or None (amorphous)
    material: Optional[Material] = dataclasses.field(default_factory=Material)
    collision_group: int = ALL_GROUPS
    collision_mask: int = ALL_GROUPS
    presentation: bool = True
    sleeping_disabled: bool = False
    networked: bool = False


class WorldBuilder:
    """Accumulates bodies/joints host-side; ``finalize()`` produces the device
    WorldState. Capacities (bodies / manifolds / joints) are padded to the
    requested sizes; the reference's dynamic entity creation maps to claiming
    pre-allocated slots (SURVEY §7 hard part 5)."""

    def __init__(self, gravity=None):
        # None = follow the world settings' gravity at make_world time
        # (reference: rigidbody_def picks up edyn::get_gravity(registry));
        # an explicit value here overrides for every body built.
        self.default_gravity = (None if gravity is None
                                else np.asarray(gravity, np.float64))
        self.defs: list[RigidBodyDef] = []
        self.joints: list[dict] = []
        self._polyhedra: list[PolyhedronShape] = []
        self._poly_index: dict[int, int] = {}  # id(shape) -> table idx
        self._meshes: list[MeshShape] = []
        self._mesh_index: dict[int, int] = {}
        self._compounds: list[CompoundShape] = []
        self._compound_index: dict[int, int] = {}
        self.exclusions: list[tuple[int, int]] = []
        self.material_mixes: list[tuple[int, int, "Material"]] = []
        # user/external component specs: name -> (shape, dtype, default)
        self.user_components: dict[str, tuple] = {}
        self.user_component_policies: dict[str, str] = {}

    def register_component(self, name: str, shape=(), dtype=None,
                           default=0.0, replicate=None):
        """Register a user component column [N, *shape] that rides the state
        pytree, replicates in snapshots, and can be an input-history target
        (reference: register_external_components,
        include/edyn/replication/register_external.hpp:28-67).

        ``replicate``: None (local-only) or a replication/exporter.py policy —
        "transient" (unreliable continuous), "reliable" (on change),
        "input" (client->server input stream)."""
        import jax.numpy as jnp
        from ..replication.snapshot import COMPONENT_COLUMNS
        if name in COMPONENT_COLUMNS:
            raise ValueError(f"{name!r} is a built-in component")
        self.user_components[name] = (tuple(shape),
                                      dtype or scalar_dtype(), default)
        if replicate is not None:
            self.user_component_policies[name] = replicate

    # -- bodies ---------------------------------------------------------
    def make_rigidbody(self, def_: RigidBodyDef) -> int:
        """Returns the body's slot index (the "entity id")."""
        idx = len(self.defs)
        self.defs.append(def_)
        if isinstance(def_.shape, PolyhedronShape):
            key = id(def_.shape)
            if key not in self._poly_index:
                self._poly_index[key] = len(self._polyhedra)
                self._polyhedra.append(def_.shape)
        elif isinstance(def_.shape, MeshShape):
            assert def_.kind == KIND_STATIC, \
                "trimesh bodies are static-only (reference: mesh_shape)"
            key = id(def_.shape)
            if key not in self._mesh_index:
                self._mesh_index[key] = len(self._meshes)
                self._meshes.append(def_.shape)
        elif isinstance(def_.shape, CompoundShape):
            key = id(def_.shape)
            if key not in self._compound_index:
                self._compound_index[key] = len(self._compounds)
                self._compounds.append(def_.shape)
        return idx

    def exclude_collision(self, a: int, b: int):
        """Reference: include/edyn/util/exclude_collision.hpp."""
        self.exclusions.append((a, b))

    def insert_material_mixing(self, id_a: int, id_b: int, material: "Material"):
        """Override the mixed material for contacts between the two material
        ids (reference: util/insert_material_mixing.hpp)."""
        self.material_mixes.append((id_a, id_b, material))

    # -- joints (filled in by constraints.joints helpers) ---------------
    def _add_joint(self, **kw) -> int:
        self.joints.append(kw)
        return len(self.joints) - 1

    # -- finalize -------------------------------------------------------
    def finalize(self, capacity: Optional[int] = None,
                 max_manifolds: Optional[int] = None,
                 max_joints: Optional[int] = None) -> WorldState:
        n = len(self.defs)
        N = capacity or max(n, 1)
        assert N >= n
        M = max_manifolds if max_manifolds is not None else max(64, 8 * N)
        J = max_joints if max_joints is not None else max(len(self.joints), 1)

        poly_np = pack_polyhedra(self._polyhedra)
        poly = PolyTable(
            verts=jnp.asarray(poly_np.verts), vert_mask=jnp.asarray(poly_np.vert_mask),
            face_normals=jnp.asarray(poly_np.face_normals),
            face_mask=jnp.asarray(poly_np.face_mask),
            edge_dirs=jnp.asarray(poly_np.edge_dirs),
            edge_mask=jnp.asarray(poly_np.edge_mask),
        ) if poly_np.verts.shape[0] else PolyTable.empty()

        # host staging
        f = scalar_dtype()
        pos = np.zeros((N, 3), f)
        orn = np.zeros((N, 4), f); orn[:, 3] = 1
        linvel = np.zeros((N, 3), f)
        angvel = np.zeros((N, 3), f)
        mass_inv = np.zeros((N,), f)
        inertia_inv = np.zeros((N, 3, 3), f)
        restitution = np.zeros((N,), f)
        friction = np.full((N,), 0.5, f)
        spin_fr = np.zeros((N,), f)
        roll_fr = np.zeros((N,), f)
        stiffness = np.full((N,), 1e10, f)
        damping = np.full((N,), 1e10, f)
        has_mat = np.zeros((N,), bool)
        mat_id = np.full((N,), -1, np.int32)
        gravity = np.zeros((N, 3), f)
        kind = np.full((N,), KIND_STATIC, np.int32)
        valid = np.zeros((N,), bool)
        sleeping_dis = np.zeros((N,), bool)
        networked = np.zeros((N,), bool)
        group = np.full((N,), ALL_GROUPS, np.uint32)
        mask = np.full((N,), ALL_GROUPS, np.uint32)
        excl = np.full((N, MAX_EXCLUSIONS), -1, np.int32)
        stype = np.zeros((N,), np.int32)
        sparams = np.zeros((N, 4), f)
        sindex = np.zeros((N,), np.int32)
        com = np.zeros((N, 3), f)
        roll_axis = np.zeros((N, 3), f)

        def _qrot(q, v):
            qv = q[:3]
            t = 2.0 * np.cross(qv, v)
            return v + q[3] * t + np.cross(qv, t)

        for i, d in enumerate(self.defs):
            valid[i] = True
            kind[i] = d.kind
            pos[i] = d.position
            orn[i] = d.orientation
            orn[i] /= np.linalg.norm(orn[i])
            linvel[i] = d.linvel
            angvel[i] = d.angvel
            if d.center_of_mass is not None:
                # def.position is the shape ORIGIN; stored pos is the world
                # COM (reference: apply_center_of_mass, rigidbody.cpp:517-543)
                com[i] = d.center_of_mass
                com_w = _qrot(np.asarray(orn[i], np.float64), com[i])
                pos[i] = np.asarray(d.position) + com_w
                linvel[i] = np.asarray(d.linvel) + np.cross(angvel[i], com_w)
            default_g = (self.default_gravity if self.default_gravity
                         is not None else np.asarray((0.0, -9.8, 0.0)))
            gravity[i] = d.gravity if d.gravity is not None else (
                default_g if d.kind == KIND_DYNAMIC else 0.0)
            sleeping_dis[i] = d.sleeping_disabled
            networked[i] = d.networked
            group[i] = d.collision_group
            mask[i] = d.collision_mask

            sh = d.shape
            if sh is None:
                stype[i] = ShapeType.NONE
            elif isinstance(sh, PolyhedronShape):
                stype[i] = ShapeType.POLYHEDRON
                sindex[i] = self._poly_index[id(sh)]
                sparams[i, 0] = sindex[i]
            elif isinstance(sh, MeshShape):
                from ..shapes.params import PagedMeshShape
                stype[i] = (ShapeType.PAGED_MESH if isinstance(sh, PagedMeshShape)
                            else ShapeType.MESH)
                sindex[i] = self._mesh_index[id(sh)]
                sparams[i, 0] = sindex[i]
            elif isinstance(sh, CompoundShape):
                stype[i] = ShapeType.COMPOUND
                sindex[i] = self._compound_index[id(sh)]
                sparams[i, 0] = sindex[i]
            else:
                st, prm = sh.pack()
                stype[i] = st
                sparams[i] = prm
            from ..shapes.params import shape_roll_direction
            roll_axis[i] = shape_roll_direction(int(stype[i]), sparams[i])

            if d.kind == KIND_DYNAMIC:
                assert d.mass > 0 and np.isfinite(d.mass), \
                    "dynamic body needs finite positive mass (reference asserts the same)"
                mass_inv[i] = 1.0 / d.mass
                if d.inertia is not None:
                    I = np.asarray(d.inertia, np.float64)
                    I = np.diag(I) if I.ndim == 1 else I
                elif isinstance(sh, PolyhedronShape):
                    I = polyhedron_inertia(sh.vertices, d.mass)
                elif isinstance(sh, CompoundShape):
                    from ..shapes.compound import compound_mass_properties
                    I, _com = compound_mass_properties(sh, d.mass)
                elif sh is not None:
                    I = np.diag(moment_of_inertia(int(stype[i]), sparams[i], d.mass))
                else:
                    raise ValueError("dynamic amorphous body requires explicit inertia "
                                     "(reference: rigidbody.hpp:41-43)")
                if d.center_of_mass is not None and d.inertia is None:
                    # parallel-axis shift: rotation happens about the user's
                    # COM (reference: shift_moment_of_inertia,
                    # moment_of_inertia.cpp:217-220)
                    dvec = np.asarray(d.center_of_mass, np.float64)
                    sk = np.array([[0, -dvec[2], dvec[1]],
                                   [dvec[2], 0, -dvec[0]],
                                   [-dvec[1], dvec[0], 0]])
                    I = I + d.mass * (sk.T @ sk)
                inertia_inv[i] = np.linalg.inv(I)

            if d.material is not None:
                has_mat[i] = True
                m = d.material
                restitution[i] = m.restitution
                friction[i] = m.friction
                spin_fr[i] = m.spin_friction
                roll_fr[i] = m.roll_friction
                stiffness[i] = m.stiffness
                damping[i] = m.damping
                mat_id[i] = m.id

        for a, b in self.exclusions:
            for (x, y) in ((a, b), (b, a)):
                slot = np.argmax(excl[x] == -1)
                excl[x, slot] = y

        from ..shapes.mesh import pack_meshes
        from ..shapes.convex import build_convex_table, shape_convex_data
        from ..shapes.compound import CompoundTable, compound_aabb_extent
        mesh_table = pack_meshes(self._meshes)

        # compound children become extra convex-table rows past the N bodies
        child_data = []
        comp_rows = []
        for comp in self._compounds:
            rows = []
            for shape, lpos, lorn in comp.children:
                if isinstance(shape, PolyhedronShape):
                    pi = self._poly_index.get(id(shape))
                    if pi is None:
                        from ..shapes.params import preprocess_polyhedron
                        v = np.asarray(shape.vertices, np.float64)
                        fn, ed = preprocess_polyhedron(v)
                        data = (v, 0.0, fn, ed, 0.0,
                                np.array([0.0, 0.0, 1.0]))
                    else:
                        data = shape_convex_data(int(ShapeType.POLYHEDRON),
                                                 (pi, 0, 0, 0), poly_np, pi)
                else:
                    st_c, prm_c = shape.pack()
                    data = shape_convex_data(int(st_c), prm_c)
                rows.append(N + len(child_data))
                child_data.append(data)
            comp_rows.append(rows)

        convex = build_convex_table(stype, sparams, sindex, poly_np,
                                    extra_data=child_data)

        if self._compounds:
            CH = max(len(r) for r in comp_rows)
            NC = len(self._compounds)
            c_row = np.full((NC, CH), -1, np.int32)
            c_pos = np.zeros((NC, CH, 3), scalar_dtype())
            c_orn = np.zeros((NC, CH, 4), scalar_dtype())
            c_orn[..., 3] = 1
            c_mask = np.zeros((NC, CH), bool)
            c_type = np.zeros((NC, CH), np.int32)
            c_prm = np.zeros((NC, CH, 4), scalar_dtype())
            for ci, (comp, rows_i) in enumerate(zip(self._compounds, comp_rows)):
                for k, ((shape, lpos, lorn), row) in enumerate(
                        zip(comp.children, rows_i)):
                    c_row[ci, k] = row
                    c_pos[ci, k] = lpos
                    q = np.asarray(lorn, np.float64)
                    c_orn[ci, k] = q / np.linalg.norm(q)
                    c_mask[ci, k] = True
                    if isinstance(shape, PolyhedronShape):
                        c_type[ci, k] = int(ShapeType.POLYHEDRON)
                    else:
                        st_c, prm_c = shape.pack()
                        c_type[ci, k] = int(st_c)
                        c_prm[ci, k] = prm_c
            compound_table = CompoundTable(
                child_row=jnp.asarray(c_row), child_pos=jnp.asarray(c_pos),
                child_orn=jnp.asarray(c_orn), child_mask=jnp.asarray(c_mask),
                child_type=jnp.asarray(c_type), child_params=jnp.asarray(c_prm))
            # compound bodies' own convex row: bounding sphere for the AABB
            for i, d in enumerate(self.defs):
                if isinstance(d.shape, CompoundShape):
                    bound = compound_aabb_extent(d.shape)
                    convex = dataclasses.replace(
                        convex, radius=convex.radius.at[i].set(bound))
        else:
            compound_table = CompoundTable.empty()

        ws = WorldState.zeros(N, M, J, poly, mesh_table, convex,
                              compound_table)
        if self.user_components:
            ws = dataclasses.replace(ws, user={
                name: jnp.full((N,) + shape, default, dtype)
                for name, (shape, dtype, default)
                in self.user_components.items()})
        ws = dataclasses.replace(
            ws,
            pos=jnp.asarray(pos), orn=jnp.asarray(orn),
            linvel=jnp.asarray(linvel), angvel=jnp.asarray(angvel),
            mass_inv=jnp.asarray(mass_inv), inertia_inv=jnp.asarray(inertia_inv),
            com=jnp.asarray(com),
            restitution=jnp.asarray(restitution), friction=jnp.asarray(friction),
            spin_friction=jnp.asarray(spin_fr), roll_friction=jnp.asarray(roll_fr),
            stiffness=jnp.asarray(stiffness), damping=jnp.asarray(damping),
            has_material=jnp.asarray(has_mat), material_id=jnp.asarray(mat_id),
            gravity=jnp.asarray(gravity), kind=jnp.asarray(kind),
            valid=jnp.asarray(valid), sleeping_disabled=jnp.asarray(sleeping_dis),
            networked=jnp.asarray(networked),
            group=jnp.asarray(group), mask=jnp.asarray(mask),
            exclusions=jnp.asarray(excl),
            shape_type=jnp.asarray(stype), shape_params=jnp.asarray(sparams),
            shape_index=jnp.asarray(sindex),
            roll_axis=jnp.asarray(roll_axis),
        )
        if self.joints:
            from ..constraints.joints import pack_joints
            ws = dataclasses.replace(ws, joints=pack_joints(self.joints, J))
        if self.material_mixes:
            from .state import MixTable
            ids = np.array([[ia, ib] for ia, ib, _ in self.material_mixes],
                           np.int32)
            vals = np.array([[m.restitution, m.friction, m.spin_friction,
                              m.roll_friction, m.stiffness, m.damping]
                             for _, _, m in self.material_mixes], scalar_dtype())
            ws = dataclasses.replace(ws, mix_table=MixTable(
                ids=jnp.asarray(ids), vals=jnp.asarray(vals)))
        # initial AABBs so raycast/query_aabb work before the first step
        # (the step refreshes them; reference: update_aabbs runs in attach too)
        from ..shapes.aabb import compute_aabbs
        amin, amax = compute_aabbs(ws.shape_type, ws.shape_params,
                                   ws.origin_pos(), ws.orn, ws.poly,
                                   ws.shape_index, ws.mesh, ws.convex)
        ws = dataclasses.replace(ws, aabb_min=amin, aabb_max=amax)
        return ws
