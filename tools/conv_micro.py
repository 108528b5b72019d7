"""Micro-bench the sparse-conv cost components on the real chip with
REAL fences: binary-search lookup, row gather, per-offset matmul, and
the composed sparse_conv, at ResNet stage-1 size (V=65536, C=64).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/conv_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(f, args, iters=8, label=""):
    import jax

    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:34s} {dt:9.2f} ms/iter", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))

    from vdetr_tpu.ops.voxelize import (
        VoxelGrid, lookup, pack_keys, voxelize,
    )
    from vdetr_tpu.ops.sparse_conv import _offsets, sparse_conv

    V = int(os.environ.get("CM_V", "65536"))
    C = int(os.environ.get("CM_C", "64"))
    K = 27
    rng = np.random.RandomState(0)
    extent = (2048, 2048, 512)

    # build a realistic sorted voxel set from clustered points
    pts = (rng.rand(1, V, 3) * np.array([6.0, 5.0, 2.8])).astype(np.float32)
    feats = rng.rand(1, V, C).astype(np.float32)
    grid = voxelize(jnp.asarray(pts), jnp.asarray(feats),
                    jnp.ones((1, V), bool), voxel_size=0.02,
                    capacity=V, extent=extent)
    np.asarray(grid.keys.ravel()[0])
    nvalid = int(np.asarray(grid.valid.sum()))
    print(f"V={V} C={C} valid voxels={nvalid}", flush=True)

    offs = jnp.asarray(_offsets(3), jnp.int32)
    keys = grid.keys[0]
    coords = grid.coords[0]
    valid = grid.valid[0]
    gfeats = grid.features[0]
    weights = jnp.asarray(rng.rand(K, C, C).astype(np.float32) * 0.01)

    # 1. query-key computation + binary-search lookup for all 27 offsets
    @jax.jit
    def do_lookup(coords, keys, valid):
        q = coords[None, :, :] + offs[:, None, :]
        qkeys = pack_keys(q, extent)
        qkeys = jnp.where(valid[None, :], qkeys, np.int64(2 ** 62))
        return lookup(keys, qkeys).sum()

    bench(do_lookup, (coords, keys, valid), label="27x binary-search lookup")

    # precomputed neighbor indices for the pure-gather / matmul benches
    q = coords[None, :, :] + offs[:, None, :]
    qkeys = pack_keys(q, extent)
    idx = jax.jit(lambda k, qk: lookup(k, qk))(keys, qkeys)  # (27, V)
    np.asarray(idx.ravel()[0])

    # 2. pure gather: 27 x (V, C) rows
    @jax.jit
    def do_gather(feats, idx):
        fx = jnp.concatenate([feats, jnp.zeros((1, C), feats.dtype)], 0)

        def step(acc, i):
            return acc + fx[i], None

        out, _ = jax.lax.scan(step, jnp.zeros((V, C), jnp.float32), idx)
        return out.sum()

    bench(do_gather, (gfeats, idx), label="27x row gather (scan)")

    # 3. pure matmuls: 27 x (V,C)@(C,C)
    @jax.jit
    def do_matmul(feats, weights):
        def step(acc, w):
            return acc + feats @ w, None

        out, _ = jax.lax.scan(step, jnp.zeros((V, C), jnp.float32), weights)
        return out.sum()

    bench(do_matmul, (gfeats, weights), label="27x matmul (scan)")

    # 4. gather+matmul fused as in _gather_matmul
    @jax.jit
    def do_both(feats, idx, weights):
        fx = jnp.concatenate([feats, jnp.zeros((1, C), feats.dtype)], 0)

        def step(acc, inp):
            i, w = inp
            return acc + fx[i] @ w, None

        out, _ = jax.lax.scan(step, jnp.zeros((V, C), jnp.float32),
                              (idx, weights))
        return out.sum()

    bench(do_both, (gfeats, idx, weights), label="27x gather+matmul (scan)")

    # 5. the composed sparse_conv (lookup every call, as production does)
    @jax.jit
    def do_conv(grid, weights):
        return sparse_conv(grid, weights).features.sum()

    bench(do_conv, (grid, weights), label="sparse_conv (full)")

    # 6. one-hot matmul alternative for the gather (MXU instead of DMA)
    @jax.jit
    def do_gather_onehot(feats, idx):
        fx = jnp.concatenate([feats, jnp.zeros((1, C), feats.dtype)], 0)

        def step(acc, i):
            oh = jax.nn.one_hot(i, V + 1, dtype=jnp.bfloat16)  # (V, V+1)
            return acc + jax.lax.dot_general(
                oh, fx.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), None

        out, _ = jax.lax.scan(step, jnp.zeros((V, C), jnp.float32), idx)
        return out.sum()

    if os.environ.get("CM_ONEHOT") == "1":  # O(V^2 C): only for small V
        bench(do_gather_onehot, (gfeats, idx), label="27x one-hot matmul")

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
