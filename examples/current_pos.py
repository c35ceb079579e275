"""Presentation-interpolation parity with the reference example
(examples/current_pos/current_pos.cpp): fixed-dt simulation with smoothed
per-frame render transforms between steps."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS"):
    # honor JAX_PLATFORMS even when a sitecustomize pins another platform
    # (lets the examples run on CPU when no TPU is reachable)
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import edyn_tpu as et
from edyn_tpu.simulation.presentation import Presentation


def main():
    builder = et.WorldBuilder()
    builder.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.5)))
    cyl = builder.make_rigidbody(et.RigidBodyDef(
        mass=5.0, shape=et.CylinderShape(0.3, 0.5), position=(0, 2, 0),
        material=et.Material(friction=0.6, roll_friction=0.01)))
    world = et.make_world(builder)
    pres = Presentation(world)
    world.step(1)  # warm compile

    t0 = time.perf_counter()
    for frame in range(60):
        world.update(elapsed=1 / 30)  # render at 30 fps, sim at 60 Hz
        pres.on_step()
        pos, orn = pres.transforms(float(world.state.sim_time))
        p = pos[cyl]
        print(f"frame {frame:3d}  render pos=({p[0]:.3f}, {p[1]:.3f}, {p[2]:.3f})")


if __name__ == "__main__":
    main()
