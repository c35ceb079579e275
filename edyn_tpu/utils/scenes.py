"""Canonical benchmark/test scenes (mirrors BASELINE.md configs)."""
from __future__ import annotations

import numpy as np

import edyn_tpu as et


def hello_world():
    """Single dynamic box onto a static ground plane (reference:
    examples/hello_world/hello_world.cpp:16-35)."""
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.5)))
    box = b.make_rigidbody(et.RigidBodyDef(
        mass=10.0, shape=et.BoxShape((0.2, 0.2, 0.2)), position=(0, 3, 0),
        material=et.Material(friction=0.8)))
    return b, box


def box_stack(n: int = 10, half: float = 0.2, spacing: float = 1.001):
    """Vertical stack of n boxes on a plane."""
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.7)))
    ids = []
    for i in range(n):
        ids.append(b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.BoxShape((half, half, half)),
            position=(0.0, half + 2 * half * spacing * i, 0.0),
            material=et.Material(friction=0.7))))
    return b, ids


def box_pyramid(base: int = 10, half: float = 0.2):
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.7)))
    ids = []
    for row in range(base):
        count = base - row
        y = half + 2 * half * row
        x0 = -(count - 1) * half
        for k in range(count):
            ids.append(b.make_rigidbody(et.RigidBodyDef(
                mass=1.0, shape=et.BoxShape((half * 0.98, half, half * 0.98)),
                position=(x0 + 2 * half * k, y, 0.0),
                material=et.Material(friction=0.7))))
    return b, ids


def mixed_pile(n_bodies: int = 10_000, seed: int = 0, bin_half: float = None,
               polyhedra: bool = True):
    """Mixed-shape pile into a plane-walled bin (BASELINE config 3/5)."""
    rng = np.random.default_rng(seed)
    b = et.WorldBuilder()
    # bin: floor + 4 inward-facing walls
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.6)))
    if bin_half is None:
        bin_half = max(4.0, 0.18 * float(n_bodies) ** (1 / 3) * 6)
    for nrm in ((1, 0, 0), (-1, 0, 0), (0, 0, 1), (0, 0, -1)):
        b.make_rigidbody(et.RigidBodyDef(
            kind=et.KIND_STATIC, shape=et.PlaneShape(nrm, -bin_half),
            material=et.Material(friction=0.6)))

    tet = et.PolyhedronShape(np.array(
        [[0.15, 0.15, 0.15], [0.15, -0.15, -0.15],
         [-0.15, 0.15, -0.15], [-0.15, -0.15, 0.15]], np.float32))
    ids = []
    side = int(np.ceil(n_bodies ** (1 / 3)))
    spacing = 0.55
    i = 0
    for ix in range(side):
        for iy in range(side):
            for iz in range(side):
                if i >= n_bodies:
                    break
                kind = i % 5
                if kind == 0:
                    shape = et.SphereShape(0.15)
                elif kind == 1:
                    shape = et.BoxShape((0.15, 0.12, 0.18))
                elif kind == 2:
                    shape = et.CapsuleShape(0.1, 0.15)
                elif kind == 3:
                    shape = et.CylinderShape(0.12, 0.15)
                else:
                    shape = tet if polyhedra else et.SphereShape(0.12)
                jitter = rng.uniform(-0.05, 0.05, 3)
                pos = ((ix - side / 2) * spacing + jitter[0],
                       1.0 + iy * spacing + jitter[1],
                       (iz - side / 2) * spacing + jitter[2])
                ids.append(b.make_rigidbody(et.RigidBodyDef(
                    mass=1.0, shape=shape, position=pos,
                    orientation=_random_quat(rng),
                    material=et.Material(friction=0.5, restitution=0.2,
                                         roll_friction=0.005))))
                i += 1
    return b, ids


def grid_mesh(nx: int = 8, nz: int = 8, size: float = 1.0, height_fn=None):
    """Triangulated height grid (+y winding)."""
    xs = np.arange(nx) * size - (nx - 1) * size / 2
    zs = np.arange(nz) * size - (nz - 1) * size / 2
    verts = []
    for x in xs:
        for z in zs:
            y = height_fn(x, z) if height_fn else 0.0
            verts.append((x, y, z))
    verts = np.asarray(verts, np.float32)
    tris = []
    for i in range(nx - 1):
        for j in range(nz - 1):
            a = i * nz + j
            bb = (i + 1) * nz + j
            c = i * nz + (j + 1)
            d = (i + 1) * nz + (j + 1)
            # (a,c,bb)/(c,d,bb): cross(v1-v0, v2-v0) points +y — mesh
            # contacts are one-sided and silently culled if wound down
            tris.append((a, c, bb))
            tris.append((c, d, bb))
    return verts, np.asarray(tris, np.int64)


def rich_scene(n_bodies: int = 4096, seed: int = 1, n_chains: int = 4,
               chain_links: int = 6, mesh_n: int = 24):
    """The full-surface validation scene: a trimesh terrain, a mixed-shape
    pile over it, and several hinge chains — exercises the mesh narrowphase,
    joint rows, and (at n_bodies > DENSE_LIMIT or when forced) the sweep
    broadphase, all in one world. Used by the multi-chip dryrun and the
    sharded-vs-single equivalence test."""
    rng = np.random.default_rng(seed)
    b = et.WorldBuilder()
    extent = max(8.0, 0.55 * float(n_bodies) ** (1 / 3) * 2.5)
    cell = 2 * extent / (mesh_n - 1)
    verts, tris = grid_mesh(mesh_n, mesh_n, cell,
                            height_fn=lambda x, z: 0.15 * np.sin(0.4 * x)
                            * np.cos(0.4 * z))
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.MeshShape(verts, tris),
        material=et.Material(friction=0.6)))
    for nrm in ((1, 0, 0), (-1, 0, 0), (0, 0, 1), (0, 0, -1)):
        b.make_rigidbody(et.RigidBodyDef(
            kind=et.KIND_STATIC, shape=et.PlaneShape(nrm, -extent),
            material=et.Material(friction=0.6)))

    ids = []
    side = int(np.ceil(n_bodies ** (1 / 3)))
    spacing = 0.55
    i = 0
    for ix in range(side):
        for iy in range(side):
            for iz in range(side):
                if i >= n_bodies:
                    break
                kind = i % 4
                if kind == 0:
                    shape = et.SphereShape(0.15)
                elif kind == 1:
                    shape = et.BoxShape((0.15, 0.12, 0.18))
                elif kind == 2:
                    shape = et.CapsuleShape(0.1, 0.15)
                else:
                    shape = et.CylinderShape(0.12, 0.15)
                jitter = rng.uniform(-0.05, 0.05, 3)
                pos = ((ix - side / 2) * spacing + jitter[0],
                       1.5 + iy * spacing + jitter[1],
                       (iz - side / 2) * spacing + jitter[2])
                ids.append(b.make_rigidbody(et.RigidBodyDef(
                    mass=1.0, shape=shape, position=pos,
                    orientation=_random_quat(rng),
                    material=et.Material(friction=0.5, restitution=0.1))))
                i += 1

    # hanging hinge chains spread around the pile
    for c in range(n_chains):
        x0 = (c - n_chains / 2) * 3.0
        anchor = b.make_rigidbody(et.RigidBodyDef(
            kind=et.KIND_STATIC, position=(x0, 4.0 + side * spacing, extent / 2),
            shape=None, material=None))
        prev = anchor
        for i_l in range(chain_links):
            link = b.make_rigidbody(et.RigidBodyDef(
                mass=1.0, shape=et.CapsuleShape(0.05, 0.2),
                position=(x0 + 0.5 + i_l * 0.5, 4.0 + side * spacing,
                          extent / 2),
                material=et.Material(friction=0.5)))
            et.make_hinge_constraint(
                b, prev, link,
                pivot_a=(0.25, 0, 0) if i_l > 0 else (0, 0, 0),
                pivot_b=(-0.25, 0, 0),
                axis_a=(0, 0, 1), axis_b=(0, 0, 1))
            ids.append(link)
            prev = link
    return b, ids


def joint_chain(n_links: int = 8):
    """Hinge chain hanging from a static anchor (BASELINE config 4)."""
    b = et.WorldBuilder()
    anchor = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, position=(0, 5, 0), shape=None, material=None))
    prev = anchor
    ids = []
    for i in range(n_links):
        link = b.make_rigidbody(et.RigidBodyDef(
            mass=1.0, shape=et.CapsuleShape(0.05, 0.2),
            position=(0.5 + i * 0.5, 5.0, 0.0),
            material=et.Material(friction=0.5)))
        et.make_hinge_constraint(
            b, prev, link,
            pivot_a=(0.25, 0, 0) if i > 0 else (0, 0, 0),
            pivot_b=(-0.25, 0, 0),
            axis_a=(0, 0, 1), axis_b=(0, 0, 1))
        ids.append(link)
        prev = link
    return b, ids


def _random_quat(rng):
    q = rng.normal(size=4)
    return tuple(q / np.linalg.norm(q))
