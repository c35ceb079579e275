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
def test_sharded_sleep_gating_matches_and_gate_taken():
    """Sleep gating COMPOSES with sharding (r3 gap: the gate required
    shard_mesh None, so multi-chip always paid full solver width): on a
    mostly-asleep world the laddered solve takes its narrow tier under the
    mesh, with results identical to the unsharded step."""
    import dataclasses
    from edyn_tpu.dynamics import solver as sm

    n_dev = 8
    builder, ids = mixed_pile(n_bodies=56)
    cap = ((len(builder.defs) + n_dev - 1) // n_dev) * n_dev
    # max_rows 4096 > the sharded ladder quantum (256 * n_dev) so a narrow
    # tier exists under the mesh
    w = et.make_world(builder, capacity=cap, max_pairs=4096,
                      max_manifolds=4096, max_joints=n_dev)
    assert w.meta.sleep_gating and w.meta.max_rows is not None
    w.step(40)
    w.put_to_sleep()
    # wake a couple of bodies so the step still has live work
    w.wake_set({ids[0], ids[1]})
    w.step(1)

    # the live row count fits the smallest ladder tier (so the sharded cond
    # takes the gated branch)
    man = w.state.contacts
    rows = sm.build_contact_rows(w.state, man, w.settings.fixed_dt, True,
                                 True, w.meta.has_spin_roll, w.meta.max_rows)
    Rfull = rows.valid.shape[0]
    quantum = 256 * n_dev
    tier0 = max(quantum, -(-(Rfull // 8) // quantum) * quantum)
    if tier0 < Rfull:
        assert int(rows.count) <= tier0, \
            f"live rows {int(rows.count)} spill the smallest tier {tier0}"

    w_ref = et.World(w.state, w.settings, w.meta)
    w_ref.step(3)

    mesh = make_mesh(jax.devices()[:n_dev])
    step, dev_state = make_sharded_step(mesh, w.state, w.settings, w.meta)
    for _ in range(3):
        dev_state = step(dev_state)
    jax.block_until_ready(dev_state.pos)

    # same tolerance as the other sharded-equivalence tests: per-shard
    # scatter-add reduction order differs from the single-device step
    np.testing.assert_allclose(np.asarray(dev_state.pos),
                               np.asarray(w_ref.state.pos), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(dev_state.asleep),
                                  np.asarray(w_ref.state.asleep))


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
