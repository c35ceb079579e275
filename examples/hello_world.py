"""Hello-world parity with the reference example
(examples/hello_world/hello_world.cpp): drop a box with friction onto a
plane and print its position while stepping."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS"):
    # honor JAX_PLATFORMS even when a sitecustomize pins another platform
    # (lets the examples run on CPU when no TPU is reachable)
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import edyn_tpu as et


def main():
    builder = et.WorldBuilder()
    builder.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.5)))
    box = builder.make_rigidbody(et.RigidBodyDef(
        mass=10.0, shape=et.BoxShape((0.2, 0.2, 0.2)), position=(0, 3, 0),
        material=et.Material(friction=0.8, restitution=0.1)))
    world = et.make_world(builder)
    for frame in range(100):
        world.step(2)
        p = world.position(box)
        print(f"t={float(world.state.sim_time):5.2f}s  "
              f"pos=({p[0]:.3f}, {p[1]:.3f}, {p[2]:.3f})"
              + ("  [asleep]" if world.is_asleep(box) else ""))
        if world.is_asleep(box):
            break


if __name__ == "__main__":
    main()
