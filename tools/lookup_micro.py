"""Benchmark neighbor-lookup strategies on the real chip: the current
binary search vs sort-based ranking vs jnp.searchsorted, at stage-1 size
(V=65536 sorted keys, 27V queries).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/lookup_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(f, args, iters=5, label=""):
    import jax

    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:40s} {dt:9.2f} ms/iter", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    from vdetr_tpu.ops.voxelize import lookup

    V, K = 65536, 27
    rng = np.random.RandomState(0)
    keys = np.sort(np.unique(rng.randint(0, 2 ** 31 - 10000, V * 2)
                             .astype(np.int64)))[:V]
    assert keys.shape[0] == V
    # realistic queries: keys shifted by small constants (27 offsets)
    consts = (rng.randint(-2000, 2000, K)).astype(np.int64)
    queries = (keys[None, :] + consts[:, None]).astype(np.int64)  # (K, V)
    keys_j = jnp.asarray(keys)
    q_j = jnp.asarray(queries)

    # 1. current: vectorized binary search (17 rounds of scalar gathers)
    bench(jax.jit(lambda k, q: lookup(k, q).sum()), (keys_j, q_j),
          label="current binary-search lookup")

    # 2. jnp.searchsorted
    @jax.jit
    def builtin_ss(k, q):
        return jnp.searchsorted(k, q.ravel()).sum()

    bench(builtin_ss, (keys_j, q_j), label="jnp.searchsorted")

    # 3. sort-based ranking: one sort of keys ++ queries; the rank of each
    # query among keys = position_in_merge - #queries before it
    @jax.jit
    def sort_rank(k, q):
        qf = q.ravel()
        nq = qf.shape[0]
        allv = jnp.concatenate([k, qf])
        tag = jnp.concatenate([jnp.zeros(V, jnp.int32),
                               jnp.ones(nq, jnp.int32)])
        order = jnp.argsort(allv, stable=True)
        tag_sorted = tag[order]
        # for each merged position: #queries at-or-before
        qcum = jnp.cumsum(tag_sorted)
        # rank among keys for elements that are queries
        rank_if_query = (jnp.arange(V + nq) + 1 - qcum)
        # scatter back to query order
        pos_of = jnp.zeros(V + nq, jnp.int32).at[order].set(
            jnp.arange(V + nq, dtype=jnp.int32))
        qpos = pos_of[V:]
        return rank_if_query[qpos].sum()

    bench(sort_rank, (keys_j, q_j), label="sort-based ranking")

    # 4. raw sort cost for scale
    @jax.jit
    def just_sort(k, q):
        return jnp.sort(jnp.concatenate([k, q.ravel()]))[0]

    bench(just_sort, (keys_j, q_j), label="jnp.sort of 28V int64")

    @jax.jit
    def just_argsort(k, q):
        return jnp.argsort(jnp.concatenate([k, q.ravel()]))[0]

    bench(just_argsort, (keys_j, q_j), label="jnp.argsort of 28V int64")

    # 5. int32 binary search (keys fit 31 bits after dense re-ranking)
    keys32 = jnp.asarray(np.arange(V, dtype=np.int32) * 31 + 7)
    q32 = jnp.asarray((np.arange(V, dtype=np.int32)[None, :] * 31
                       + consts[:, None].astype(np.int32)))

    @jax.jit
    def bs32(k, q):
        lo = jnp.zeros(q.shape, jnp.int32)
        hi = jnp.full(q.shape, V, jnp.int32)
        for _ in range(17):
            mid = (lo + hi) // 2
            km = k[jnp.clip(mid, 0, V - 1)]
            go = km < q
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return lo.sum()

    bench(bs32, (keys32, q32), label="int32 binary search")

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
