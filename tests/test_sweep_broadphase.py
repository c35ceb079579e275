"""Dense vs sort-and-sweep broadphase equivalence (the 50k-scale path).

The sweep path (collision/broadphase.py find_pairs_sweep) is the scalability
replacement for the reference's dynamic AABB tree; both paths must produce
the same sorted pair-key set for the same world, and therefore identical
simulation results."""
import dataclasses

import numpy as np

import edyn_tpu as et
from edyn_tpu.utils import scenes


def test_dense_vs_sweep_equivalence():
    b, ids = scenes.mixed_pile(n_bodies=96)
    w_d = et.make_world(b)
    w_d.meta = dataclasses.replace(w_d.meta, broadphase_mode="dense")

    b2, _ = scenes.mixed_pile(n_bodies=96)
    w_s = et.make_world(b2)
    w_s.meta = dataclasses.replace(w_s.meta, broadphase_mode="sweep")

    w_d.step(90)
    w_s.step(90)
    w_d.block_until_ready()
    w_s.block_until_ready()

    # no silent drops on either path
    assert w_d.overflow_counters()["broadphase_pairs"] == 0
    assert w_s.overflow_counters()["broadphase_pairs"] == 0

    # identical live pair sets => identical trajectories
    kd = np.asarray(w_d.state.contacts.key)[np.asarray(w_d.state.contacts.valid)]
    ks = np.asarray(w_s.state.contacts.key)[np.asarray(w_s.state.contacts.valid)]
    np.testing.assert_array_equal(np.sort(kd), np.sort(ks))
    np.testing.assert_allclose(np.asarray(w_d.state.pos)[ids],
                               np.asarray(w_s.state.pos)[ids],
                               atol=1e-4)
