"""A drivable 4-wheel vehicle: compound chassis with a lowered center of
mass, exact-cylinder wheels on hinge joints, driven by wheel torque.

Exercises, through the public API only: compound shapes, center_of_mass
offsets (reference: comp/center_of_mass.hpp), hinge joints with friction
(reference: hinge_constraint), exact cylinder narrowphase, and per-body
materials. The reference ships no vehicle example; this plays the role its
docs suggest for vehicles built from cylinders + hinges (README.md:145-170
feature list).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS"):
    # honor JAX_PLATFORMS even when a sitecustomize pins another platform
    # (lets the examples run on CPU when no TPU is reachable)
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import edyn_tpu as et
from edyn_tpu.constraints.api import make_hinge_constraint

WHEEL_R = 0.35
WHEEL_W = 0.1
CHASSIS = (0.9, 0.18, 0.5)      # half extents
WHEEL_X = 0.75
WHEEL_Z = 0.65
AXLE_Y = WHEEL_R                # wheels touch the ground at spawn


def build():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.9)))

    chassis_shape = et.CompoundShape(children=[
        (et.BoxShape(CHASSIS), (0, 0, 0), (0, 0, 0, 1)),
        (et.BoxShape((0.4, 0.14, 0.45)), (-0.1, 0.3, 0), (0, 0, 0, 1)),
    ])
    # mass ratio chassis:wheel kept ~4:1 — iterative solvers (reference
    # included) sag on extreme ratios across joints
    chassis = b.make_rigidbody(et.RigidBodyDef(
        mass=40.0, shape=chassis_shape, position=(0, AXLE_Y + 0.25, 0),
        center_of_mass=(0.0, -0.15, 0.0),  # low COM: resists rollover
        material=et.Material(friction=0.4), sleeping_disabled=True))

    wheels = []
    # wheel cylinders: CylinderShape axis is x; rotate it onto z (the axle)
    q = (0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4))
    for sx in (WHEEL_X, -WHEEL_X):
        for sz in (WHEEL_Z, -WHEEL_Z):
            w_ = b.make_rigidbody(et.RigidBodyDef(
                mass=10.0, shape=et.CylinderShape(WHEEL_R, WHEEL_W),
                position=(sx, AXLE_Y, sz), orientation=q,
                material=et.Material(friction=1.1, roll_friction=0.002),
                sleeping_disabled=True))
            # hinge: axle along world z; pivots in each body's origin frame
            make_hinge_constraint(
                b, chassis, w_,
                pivot_a=(sx, -0.25, sz),
                pivot_b=(0.0, 0.0, 0.0),
                axis_a=(0, 0, 1), axis_b=(1, 0, 0),  # wheel local axis = x
                friction_torque=0.3, damping=0.05,
                disable_collision=True)
            wheels.append(w_)
    return b, chassis, wheels


def main():
    b, chassis, wheels = build()
    world = et.make_world(b)
    drive_torque = 60.0  # N*m per wheel, about the axle (world z)
    for frame in range(120):
        for w_ in wheels:
            world.apply_torque_impulse(
                w_, (0.0, 0.0, -drive_torque * world.settings.fixed_dt))
        world.step(1)
        if frame % 20 == 19:
            p = world.position(chassis)
            v = world.linvel(chassis)
            print(f"t={(frame + 1) / 60:4.2f}s  x={float(p[0]):+6.2f}  "
                  f"y={float(p[1]):5.2f}  vx={float(v[0]):+5.2f}")
    assert float(world.position(chassis)[0]) > 1.0, "vehicle didn't drive"
    print("vehicle drove forward under wheel torque")


if __name__ == "__main__":
    main()
