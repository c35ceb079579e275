"""Multi-chip sharding over the 8-device virtual CPU mesh (the driver's
dryrun_multichip covers the same path; this keeps it inside the suite)."""
import jax
import numpy as np
import pytest

import edyn_tpu as et
from edyn_tpu.parallel.sharding import make_mesh, make_sharded_step, state_shardings
from edyn_tpu.utils.scenes import mixed_pile


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    n_dev = 8
    builder, ids = mixed_pile(n_bodies=56)
    cap = ((len(builder.defs) + n_dev - 1) // n_dev) * n_dev
    w = et.make_world(builder, capacity=cap, max_pairs=1024,
                      max_manifolds=1024, max_joints=n_dev)

    # single-device result
    w_ref = et.World(w.state, w.settings, w.meta)
    w_ref.step(5)

    mesh = make_mesh(jax.devices()[:n_dev])
    step, dev_state = make_sharded_step(mesh, w.state, w.settings, w.meta)
    for _ in range(5):
        dev_state = step(dev_state)
    jax.block_until_ready(dev_state.pos)

    np.testing.assert_allclose(np.asarray(dev_state.pos),
                               np.asarray(w_ref.state.pos), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dev_state.linvel),
                               np.asarray(w_ref.state.linvel), atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device_joints_mesh_sweep():
    """Equivalence on the full sharding surface: trimesh terrain, live hinge
    joints, and the sweep broadphase path (the dryrun's scene, shrunk)."""
    import dataclasses
    from edyn_tpu.utils.scenes import rich_scene
    n_dev = 8
    builder, ids = rich_scene(n_bodies=48, n_chains=2, chain_links=4,
                              mesh_n=8)
    cap = ((len(builder.defs) + n_dev - 1) // n_dev) * n_dev
    w = et.make_world(builder, capacity=cap, max_pairs=1024,
                      max_manifolds=1024)
    w.meta = dataclasses.replace(w.meta, broadphase_mode="sweep")
    assert w.meta.has_joints

    w_ref = et.World(w.state, w.settings, w.meta)
    w_ref.step(5)

    mesh = make_mesh(jax.devices()[:n_dev])
    step, dev_state = make_sharded_step(mesh, w.state, w.settings, w.meta)
    for _ in range(5):
        dev_state = step(dev_state)
    jax.block_until_ready(dev_state.pos)

    np.testing.assert_allclose(np.asarray(dev_state.pos),
                               np.asarray(w_ref.state.pos), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dev_state.linvel),
                               np.asarray(w_ref.state.linvel), atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharding_specs_cover_tables():
    builder, ids = mixed_pile(n_bodies=56)
    w = et.make_world(builder, capacity=64, max_pairs=1024, max_manifolds=1024)
    mesh = make_mesh(jax.devices()[:8])
    sh = state_shardings(mesh, w.state)
    # body tables sharded over the mesh
    from jax.sharding import PartitionSpec as P
    assert sh.pos.spec == P("b")
    assert sh.contacts.key.spec == P("b")
