"""Ragdoll rig (reference: util/ragdoll.cpp factory)."""
import numpy as np

import edyn_tpu as et
from edyn_tpu.utils.ragdoll import RagdollDef, make_ragdoll


def test_ragdoll_drops_and_holds_together():
    b = et.WorldBuilder()
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0.0),
        material=et.Material(friction=0.8)))
    rag = make_ragdoll(b, RagdollDef(position=(0, 0.3, 0)))
    w = et.make_world(b)
    w.step(240)
    w.block_until_ready()
    pos = np.array([w.position(i) for i in rag.bodies()])
    # nothing fell through the floor or exploded
    assert pos[:, 1].min() > -0.05, pos[:, 1].min()
    assert np.abs(pos).max() < 5.0, "ragdoll exploded"
    # head stays attached to the torso chain
    d_head = np.linalg.norm(w.position(rag.head) - w.position(rag.torso_upper))
    assert d_head < 0.5, d_head
    # knees stay attached
    d_knee = np.linalg.norm(w.position(rag.upper_leg_left)
                            - w.position(rag.lower_leg_left))
    assert d_knee < 0.5, d_knee
