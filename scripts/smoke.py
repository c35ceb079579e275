"""Quick end-to-end smoke: box dropped onto a static plane (mirrors
examples/hello_world/hello_world.cpp in the reference)."""
import os, sys
if os.environ.get("SMOKE_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import edyn_tpu as et

b = et.WorldBuilder()
ground = b.make_rigidbody(et.RigidBodyDef(
    kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
    material=et.Material(friction=0.5, restitution=0.0)))
box = b.make_rigidbody(et.RigidBodyDef(
    kind=et.KIND_DYNAMIC, mass=10.0, shape=et.BoxShape((0.2, 0.2, 0.2)),
    position=(0, 3, 0), orientation=(0, 0, 0, 1),
    material=et.Material(friction=0.8, restitution=0.0)))

w = et.make_world(b, et.Settings())
t0 = time.time()
w.step(1)
w.block_until_ready()
print(f"compile+first step: {time.time()-t0:.1f}s")

t0 = time.time()
for i in range(240):
    w.step(1)
w.block_until_ready()
print(f"240 steps: {time.time()-t0:.2f}s")
print("pos:", w.position(box), "vel:", w.linvel(box))
print("asleep:", w.is_asleep(box), "contacts valid:", int(np.asarray(w.state.contacts.valid).sum()))
assert abs(w.position(box)[1] - 0.2) < 0.05, w.position(box)
print("OK")
