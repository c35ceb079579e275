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
