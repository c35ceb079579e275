"""Diagnose dense-broadphase row occupancy at scale.

Runs the bench's mixed pile, settles it, then recomputes the admission-box
overlap matrix on the host (numpy) to report: total pairs, per-row counts
(narrow rows hold higher-indexed narrow partners + all wide partners),
cap-28 spill, wide-body count — the inputs to find_pairs' dense_row_cap /
wide_cap / max_pairs sizing.

Usage: python scripts/diag_pairs_10k.py [n_bodies] [settle_steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
SETTLE = int(sys.argv[2]) if len(sys.argv) > 2 else 340


def report(state, tag):
    import numpy as np
    amin = np.asarray(state.bp_aabb_min, np.float32)
    amax = np.asarray(state.bp_aabb_max, np.float32)
    valid = np.asarray(state.valid) & (np.asarray(state.shape_type) != 0)
    span = np.maximum((amax[valid].max(0) - amin[valid].min(0)), 1e-6)
    wide = valid & ((amax - amin) > 0.25 * span[None, :]).any(-1)
    narrow = valid & ~wide
    n = amin.shape[0]
    # narrow-narrow overlap, i<j
    rowcnt = np.zeros(n, np.int64)
    CH = 2048
    nn = np.where(narrow)[0]
    for s in range(0, len(nn), CH):
        i = nn[s:s + CH]
        o = (amin[i][:, None, :] <= amax[nn][None, :, :]).all(-1)
        o &= (amax[i][:, None, :] >= amin[nn][None, :, :]).all(-1)
        o &= i[:, None] < nn[None, :]
        rowcnt[i] += o.sum(1)
    nn_total = int(rowcnt.sum())
    # wide partners all live in the narrow row
    wi = np.where(wide)[0]
    if len(wi):
        ow = (amin[:, None, :] <= amax[wi][None, :, :]).all(-1)
        ow &= (amax[:, None, :] >= amin[wi][None, :, :]).all(-1)
        ow &= valid[:, None] & (narrow[:, None] | (np.arange(n)[:, None] < wi[None, :]))
        rowcnt += ow.sum(1)
    q = np.quantile(rowcnt[valid], [0.5, 0.9, 0.99, 1.0])
    print(f"[{tag}] bodies={int(valid.sum())} wide={int(wide.sum())} "
          f"pairs={int(rowcnt.sum())} (nn={nn_total}) "
          f"row p50/p90/p99/max={q.astype(int).tolist()} "
          f"spill@28={int(np.maximum(rowcnt - 28, 0).sum())} "
          f"rows>28={int((rowcnt > 28).sum())} "
          f"spill@48={int(np.maximum(rowcnt - 48, 0).sum())}",
          flush=True)


def main():
    import numpy as np
    import jax
    import edyn_tpu as et
    from edyn_tpu.utils import scenes

    print("backend:", jax.default_backend(), flush=True)
    builder, _ = scenes.mixed_pile(n_bodies=N)
    world = et.make_world(builder, et.Settings())
    print("max_pairs:", world.meta.max_pairs, "max_rows:", world.meta.max_rows,
          flush=True)
    world.step_n(2)
    world.block_until_ready()
    report(world.state, "initial")
    print("overflow:", world.overflow_counters(), flush=True)
    done = 0
    while done < SETTLE:
        k = min(64, SETTLE - done)
        world.step_n(k)
        world.block_until_ready()
        done += k
        asleep = float(np.asarray(world.state.asleep).sum())
        dyn = float(np.asarray(world.state.is_dynamic).sum())
        print(f"  settle {done}: asleep={asleep/max(dyn,1):.3f} "
              f"overflow={world.overflow_counters()}", flush=True)
    report(world.state, f"settled+{SETTLE}")


if __name__ == "__main__":
    main()
