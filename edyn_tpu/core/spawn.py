"""Runtime body creation/destruction into pre-allocated slots.

The reference creates entities dynamically in the EnTT registry
(make_rigidbody / registry.destroy). With a fixed-capacity SoA world, runtime
creation claims the first free slot and writes the def's columns functionally
(SURVEY §7 hard part 5: dynamic population under fixed capacity).
Polyhedron/compound/mesh shapes must reference shapes already present in the
world's side tables (share the shape object used at build time).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import scalar_dtype
from ..shapes.params import PolyhedronShape, ShapeType, shape_roll_direction
from ..shapes.inertia import moment_of_inertia, polyhedron_inertia
from .builder import RigidBodyDef
from .state import KIND_DYNAMIC, WorldState


def find_free_slot(state: WorldState) -> int:
    valid = np.asarray(state.valid)
    free = np.nonzero(~valid)[0]
    if len(free) == 0:
        raise RuntimeError("world at capacity — rebuild with a larger capacity")
    return int(free[0])


def spawn_rigidbody(state: WorldState, d: RigidBodyDef, slot: int | None = None,
                    default_gravity=(0.0, -9.8, 0.0),
                    poly_index: int | None = None):
    """Returns (state, slot). Mirrors make_rigidbody
    (src/edyn/util/rigidbody.cpp) against a live world."""
    i = find_free_slot(state) if slot is None else slot

    if d.shape is None:
        stype, sparams = ShapeType.NONE, (0.0, 0.0, 0.0, 0.0)
        sindex = 0
    elif isinstance(d.shape, PolyhedronShape):
        assert poly_index is not None, \
            "runtime polyhedron spawn requires poly_index into the world's table"
        stype = ShapeType.POLYHEDRON
        sparams = (float(poly_index), 0.0, 0.0, 0.0)
        sindex = poly_index
    else:
        stype, sparams = d.shape.pack()
        sindex = 0

    if d.kind == KIND_DYNAMIC:
        assert d.mass > 0 and np.isfinite(d.mass)
        mass_inv = 1.0 / d.mass
        if d.inertia is not None:
            I = np.asarray(d.inertia, np.float64)
            I = np.diag(I) if I.ndim == 1 else I
        elif isinstance(d.shape, PolyhedronShape):
            I = polyhedron_inertia(d.shape.vertices, d.mass)
        elif d.shape is not None:
            I = np.diag(moment_of_inertia(int(stype), sparams, d.mass))
        else:
            raise ValueError("dynamic amorphous body requires explicit inertia")
        inertia_inv = np.linalg.inv(I)
        grav = d.gravity if d.gravity is not None else default_gravity
    else:
        mass_inv = 0.0
        inertia_inv = np.zeros((3, 3))
        grav = (0.0, 0.0, 0.0)

    m = d.material
    orn = np.asarray(d.orientation, np.float64)
    orn = orn / np.linalg.norm(orn)

    # center of mass: def.position is the shape ORIGIN; stored pos is the
    # world COM (reference: apply_center_of_mass, rigidbody.cpp:517-543)
    com = np.zeros(3)
    pos_w = np.asarray(d.position, np.float64)
    linvel = np.asarray(d.linvel, np.float64)
    if d.center_of_mass is not None:
        com = np.asarray(d.center_of_mass, np.float64)
        qv, qw = orn[:3], orn[3]
        t = 2.0 * np.cross(qv, com)
        com_w = com + qw * t + np.cross(qv, t)
        pos_w = pos_w + com_w
        linvel = linvel + np.cross(np.asarray(d.angvel, np.float64), com_w)
        if d.kind == KIND_DYNAMIC and d.inertia is None:
            sk = np.array([[0, -com[2], com[1]],
                           [com[2], 0, -com[0]],
                           [-com[1], com[0], 0]])
            inertia_inv = np.linalg.inv(np.linalg.inv(inertia_inv)
                                        + d.mass * (sk.T @ sk))

    st = state
    set_ = lambda col, val: getattr(st, col).at[i].set(val)
    st = dataclasses.replace(
        st,
        valid=set_("valid", True),
        kind=set_("kind", d.kind),
        # unseat the carried broadphase box of a recycled slot so the next
        # step seats it at the new body's AABB
        bp_aabb_min=set_("bp_aabb_min", 1e30),
        bp_aabb_max=set_("bp_aabb_max", -1e30),
        pos=set_("pos", jnp.asarray(pos_w, scalar_dtype())),
        com=set_("com", jnp.asarray(com, scalar_dtype())),
        orn=set_("orn", jnp.asarray(orn, scalar_dtype())),
        linvel=set_("linvel", jnp.asarray(linvel, scalar_dtype())),
        angvel=set_("angvel", jnp.asarray(d.angvel, scalar_dtype())),
        mass_inv=set_("mass_inv", mass_inv),
        inertia_inv=set_("inertia_inv", jnp.asarray(inertia_inv, scalar_dtype())),
        gravity=set_("gravity", jnp.asarray(grav, scalar_dtype())),
        restitution=set_("restitution", m.restitution if m else 0.0),
        friction=set_("friction", m.friction if m else 0.5),
        spin_friction=set_("spin_friction", m.spin_friction if m else 0.0),
        roll_friction=set_("roll_friction", m.roll_friction if m else 0.0),
        stiffness=set_("stiffness", m.stiffness if m else 1e10),
        damping=set_("damping", m.damping if m else 1e10),
        has_material=set_("has_material", m is not None),
        material_id=set_("material_id", m.id if m else -1),
        group=set_("group", jnp.uint32(d.collision_group)),
        mask=set_("mask", jnp.uint32(d.collision_mask)),
        shape_type=set_("shape_type", int(stype)),
        shape_params=set_("shape_params", jnp.asarray(sparams, scalar_dtype())),
        shape_index=set_("shape_index", sindex),
        roll_axis=set_("roll_axis", jnp.asarray(
            shape_roll_direction(int(stype), sparams), scalar_dtype())),
        sleeping_disabled=set_("sleeping_disabled", d.sleeping_disabled),
        networked=set_("networked", d.networked),
        asleep=set_("asleep", False),
        sleep_timer=set_("sleep_timer", 0.0),
    )
    if stype == ShapeType.POLYHEDRON:
        p = state.poly
        pi = int(sindex)
        vm_ = np.asarray(p.vert_mask[pi])
        data = (np.asarray(p.verts[pi])[vm_], 0.0,
                np.asarray(p.face_normals[pi])[np.asarray(p.face_mask[pi])],
                np.asarray(p.edge_dirs[pi])[np.asarray(p.edge_mask[pi])],
                0.0, np.array([0.0, 0.0, 1.0]))
    else:
        data = None
    st = dataclasses.replace(st, convex=update_convex_row(
        st.convex, i, int(stype), sparams, data))
    return st, i


def update_convex_row(cx, i: int, stype: int, sparams, data=None):
    """Write one body's unified convex data into the (fixed-width) table.
    The spawned shape must fit the world's padded vert/face/edge widths."""
    from ..shapes.convex import shape_convex_data
    v, r, f, e, dr, da = (data if data is not None
                          else shape_convex_data(stype, sparams))
    V = cx.verts.shape[1]
    F = cx.face_normals.shape[1]
    E = cx.edge_dirs.shape[1]
    assert len(v) <= V and len(f) <= F and len(e) <= E, \
        "spawned shape exceeds the world's convex table widths — " \
        "build the world with at least one shape of this complexity"
    pad_v = np.zeros((V, 3), scalar_dtype())
    pad_v[:len(v)] = v
    if len(v):
        pad_v[len(v):] = v[0]
    vm = np.zeros((V,), bool)
    vm[:len(v)] = True
    pad_f = np.zeros((F, 3), scalar_dtype())
    pad_f[:len(f)] = f
    fm = np.zeros((F,), bool)
    fm[:len(f)] = True
    pad_e = np.zeros((E, 3), scalar_dtype())
    pad_e[:len(e)] = e
    em = np.zeros((E,), bool)
    em[:len(e)] = True
    return dataclasses.replace(
        cx,
        verts=cx.verts.at[i].set(jnp.asarray(pad_v)),
        vert_mask=cx.vert_mask.at[i].set(jnp.asarray(vm)),
        radius=cx.radius.at[i].set(float(r)),
        face_normals=cx.face_normals.at[i].set(jnp.asarray(pad_f)),
        face_mask=cx.face_mask.at[i].set(jnp.asarray(fm)),
        edge_dirs=cx.edge_dirs.at[i].set(jnp.asarray(pad_e)),
        edge_mask=cx.edge_mask.at[i].set(jnp.asarray(em)),
        disc_r=cx.disc_r.at[i].set(float(dr)),
        disc_axis=cx.disc_axis.at[i].set(jnp.asarray(da, scalar_dtype())))


def destroy_rigidbody(state: WorldState, i: int) -> WorldState:
    """reference: clear_rigidbody (src/edyn/util/rigidbody.cpp)."""
    return dataclasses.replace(
        state,
        valid=state.valid.at[i].set(False),
        bp_aabb_min=state.bp_aabb_min.at[i].set(1e30),
        bp_aabb_max=state.bp_aabb_max.at[i].set(-1e30),
        com=state.com.at[i].set(0.0),
        shape_type=state.shape_type.at[i].set(int(ShapeType.NONE)),
        roll_axis=state.roll_axis.at[i].set(0.0),
        linvel=state.linvel.at[i].set(0.0),
        angvel=state.angvel.at[i].set(0.0),
        mass_inv=state.mass_inv.at[i].set(0.0),
        asleep=state.asleep.at[i].set(False),
    )
