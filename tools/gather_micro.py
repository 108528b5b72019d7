"""Measure XLA:TPU row-gather / row-scatter throughput vs row width.

Purpose: pick the sparse-conv data layout. The round-2 finding was that
27x per-voxel row gathers (256 B rows) run at ~65 GB/s effective (~8% of
v5e HBM peak); the open question is how fast the same gather runs at
block granularity (1-16 KB rows) — that number decides whether a
block-dense backbone (gathering whole 4^3-voxel blocks) reaches peak.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/gather_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(f, args, iters=8, label="", nbytes=None):
    import jax

    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / iters
    gbs = (nbytes / dt / 1e9) if nbytes else float("nan")
    print(f"{label:44s} {dt * 1000:9.3f} ms  {gbs:8.1f} GB/s", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))

    rng = np.random.RandomState(0)
    TOTAL = 64 * 1024 * 1024  # 64 MB source table
    REP = 16  # repeats inside one jit: amortize the ~3-4 ms axon dispatch

    for row_floats in (64, 256, 1024, 4096):
        V = TOTAL // 4 // row_floats
        n_out = V  # gather as many rows as the table holds
        table = jnp.asarray(rng.rand(V, row_floats).astype(np.float32))
        idx_rand = jnp.asarray(
            rng.randint(0, V, size=(REP, n_out)).astype(np.int32))
        idx_sort = jnp.sort(idx_rand, axis=1)
        moved = REP * n_out * row_floats * 4

        @jax.jit
        def g(t, i):
            def step(acc, ii):
                return acc + t[ii], None
            out, _ = jax.lax.scan(step, jnp.zeros_like(t[:n_out]), i)
            return out.sum()

        bench(g, (table, idx_rand),
              label=f"gather rows={row_floats * 4:6d}B random", nbytes=moved)
        bench(g, (table, idx_sort),
              label=f"gather rows={row_floats * 4:6d}B sorted", nbytes=moved)

        src = jnp.asarray(rng.rand(n_out, row_floats).astype(np.float32))

        @jax.jit
        def s(srcv, i):
            def step(acc, ii):
                return acc.at[ii].add(srcv), None
            out, _ = jax.lax.scan(
                step, jnp.zeros((V, row_floats), jnp.float32), i)
            return out.sum()

        bench(s, (src, idx_rand),
              label=f"scatter-add rows={row_floats * 4:6d}B random",
              nbytes=moved)

    # dense streaming baseline (read 64 MB, REP times)
    big = jnp.asarray(rng.rand(TOTAL // 4).astype(np.float32))

    @jax.jit
    def cp(x):
        def step(acc, _):
            return acc * 1.0000001 + x.sum(), None
        out, _ = jax.lax.scan(step, jnp.float32(0), None, length=REP)
        return out

    bench(cp, (big,), label="dense stream 64MB", nbytes=TOTAL * REP)

    # bf16 small-row gather: same transactions, half the bytes
    tb = jnp.asarray(
        (rng.rand(TOTAL // 4 // 64, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    Vb = tb.shape[0]
    ib = jnp.asarray(rng.randint(0, Vb, size=(REP, Vb)).astype(np.int32))

    @jax.jit
    def gb(t, i):
        def step(acc, ii):
            return acc + t[ii].astype(jnp.float32), None
        out, _ = jax.lax.scan(step, jnp.zeros((Vb, 64), jnp.float32), i)
        return out.sum()

    bench(gb, (tb, ib), label="gather rows=256B as bf16 (128B rows)",
          nbytes=REP * Vb * 128)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
