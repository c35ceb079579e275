"""Feasibility + perf probe for Mosaic dynamic_gather (Pallas TPU).

Mosaic (jax 0.9) lowers lax.gather ONLY for same-shape 2D take_along_axis
(out.shape == x.shape == idx.shape), either dim:
  dim0: out[i,j] = x[idx[i,j], j]   (per-lane sublane gather)
  dim1: out[i,j] = x[i, idx[i,j]]   (per-sublane lane gather)
No scatter lowering exists. This probe checks both dims actually compile+run
on this TPU, validates semantics across tile boundaries, and measures
throughput at solver-realistic sizes.

Run: python scripts/probe_pallas_gather.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, check=None):
    try:
        out = jax.block_until_ready(fn())
        ok = True if check is None else check(np.asarray(out))
        # timing: 10 repeats
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"OK   {name}: {dt*1e3:.3f} ms/call, semantics {'OK' if ok else 'WRONG'}")
        return True
    except Exception as e:
        first = (str(e).splitlines() or [repr(e)])[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {first}")
        return False


def gather_dim0(x, idx):
    def kern(i_ref, t_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, x)


def gather_dim1(x, idx):
    def kern(i_ref, t_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, x)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)

    # --- dim0 small: x [256,128], random sublane indices across tiles ---
    x = jnp.asarray(rng.randn(256, 128), jnp.float32)
    i0 = rng.randint(0, 256, (256, 128)).astype(np.int32)
    run("dim0 [256,128] cross-tile", lambda: gather_dim0(x, jnp.asarray(i0)),
        check=lambda o: np.allclose(o, np.asarray(x)[i0, np.arange(128)[None, :]]))

    # --- dim1 small: x [8,512], random lane indices across tiles ---
    y = jnp.asarray(rng.randn(8, 512), jnp.float32)
    i1 = rng.randint(0, 512, (8, 512)).astype(np.int32)
    run("dim1 [8,512] cross-tile", lambda: gather_dim1(y, jnp.asarray(i1)),
        check=lambda o: np.allclose(o, np.asarray(y)[np.arange(8)[:, None], i1]))

    # --- solver-realistic dim1: velocity table [8, 65536] ---
    W = 65536
    v = jnp.asarray(rng.randn(8, W), jnp.float32)
    iv = jnp.asarray(rng.randint(0, W, (8, W)).astype(np.int32))
    run(f"dim1 [8,{W}] velocity-gather", lambda: gather_dim1(v, iv))

    # --- solver-view-realistic dim1: [40, 65536] ---
    v40 = jnp.asarray(rng.randn(40, W), jnp.float32)
    iv40 = jnp.asarray(rng.randint(0, W, (40, W)).astype(np.int32))
    run(f"dim1 [40,{W}] rowbuild-gather", lambda: gather_dim1(v40, iv40))

    # --- solver-realistic dim0: [8192, 128] ---
    v2 = jnp.asarray(rng.randn(8192, 128), jnp.float32)
    i2 = jnp.asarray(rng.randint(0, 8192, (8192, 128)).astype(np.int32))
    run("dim0 [8192,128]", lambda: gather_dim0(v2, i2))

    # --- one-hot matmul scatter-add at block scale: [10240,8] += oh @ [512,8] ---
    NN, BLKR = 10240, 512

    def scatter_mm():
        upd = jnp.asarray(rng.randn(BLKR, 8), jnp.float32)
        tgt = jnp.asarray(rng.randint(0, NN, BLKR).astype(np.int32))

        def kern(t_ref, u_ref, o_ref):
            oh = (jax.lax.broadcasted_iota(jnp.int32, (NN, BLKR), 0)
                  == t_ref[:][None, :]).astype(jnp.float32)
            o_ref[:] = jnp.dot(oh, u_ref[:], preferred_element_type=jnp.float32)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NN, 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tgt, upd)

    run(f"one-hot mm scatter [{NN}]+=[{BLKR},8]", scatter_mm)

    # --- in-kernel fori_loop over 140 blocks of one-hot scatter (full iter) ---
    R2 = 71680  # 140 blocks of 512

    def scatter_full():
        upd = jnp.asarray(rng.randn(R2, 8), jnp.float32)
        tgt = jnp.asarray(rng.randint(0, NN, R2).astype(np.int32))

        def kern(t_ref, u_ref, o_ref):
            def body(k, acc):
                blk_t = t_ref[pl.ds(k * BLKR, BLKR)]
                blk_u = u_ref[pl.ds(k * BLKR, BLKR), :]
                oh = (jax.lax.broadcasted_iota(jnp.int32, (NN, BLKR), 0)
                      == blk_t[None, :]).astype(jnp.float32)
                return acc + jnp.dot(oh, blk_u,
                                     preferred_element_type=jnp.float32)
            o_ref[:] = jax.lax.fori_loop(
                0, R2 // BLKR, body, jnp.zeros((NN, 8), jnp.float32))

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NN, 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tgt, upd)

    run(f"one-hot mm scatter FULL [{R2}]->[{NN},8]", scatter_full)

    # --- XLA baseline comparisons (outside pallas) ---
    ab = jnp.asarray(rng.randint(0, NN, R2).astype(np.int32))
    dvw = jnp.asarray(rng.randn(NN, 6), jnp.float32)
    upd6 = jnp.asarray(rng.randn(R2, 6), jnp.float32)
    g = jax.jit(lambda d, a: d[a])
    s = jax.jit(lambda d, a, u: d.at[a].add(u))
    run(f"XLA gather dvw[{R2}] from [{NN},6]", lambda: g(dvw, ab))
    run(f"XLA scatter-add [{R2},6] -> [{NN},6]", lambda: s(dvw, ab, upd6))


if __name__ == "__main__":
    main()
