"""Micro-bench: z-run slice gathers vs per-row gathers for sparse conv.

Hypothesis (ROUND3): for a fixed (dx,dy) offset group the three dz
neighbors live at consecutive ranks of the z-fastest sorted key array, so
one gather of (3, C) row-slices replaces three row gathers — 3x the
bytes per transaction, and tools/gather_micro.py showed gather rate
scales with transaction size (256 B 20 GB/s -> 1 KB 65 GB/s -> 4 KB
99 GB/s).

Measures, at conv-stage-like (V, C):
  rowgather   — 3 independent row gathers of (V, C)    [current scheme]
  slicegather — 1 vmap(dynamic_slice (3, C)) gather    [proposed]
  slice+sel   — slicegather + 3x3 selection einsum + grouped matmul
  rowg+mm     — rowgather + 3 per-offset matmuls       [current full]
Each timed with in-jit 8-deep loops and a host-transfer fence.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def bench(fn, *args, iters=8):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    out = fn(*args)
    _sync(out)
    return (time.time() - t0) * 1000


DEPTH = 8


def main():
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()}")
    for V, C, label in ((65536, 64, "stage1"), (32768, 128, "stage2"),
                        (16384, 256, "stage3"), (8192, 512, "stage4")):
        feats = jnp.asarray(rng.randn(V + 3, C).astype(np.float32))
        base = jnp.asarray(rng.randint(0, V, size=(V,)).astype(np.int32))
        pos = jnp.asarray(rng.randint(0, 4, size=(3, V)).astype(np.int32))
        w = jnp.asarray(rng.randn(3, C, C).astype(np.float32) * 0.1)

        @jax.jit
        def rowgather(feats, base):
            acc = jnp.zeros((V, C), jnp.float32)
            for d in range(DEPTH):
                for s in range(3):
                    acc = acc + feats[jnp.clip(base + s + d, 0, V)]
            return acc

        @jax.jit
        def slicegather(feats, base):
            acc = jnp.zeros((V, 3, C), jnp.float32)
            for d in range(DEPTH):
                x = jax.vmap(
                    lambda i: jax.lax.dynamic_slice(feats, (i, 0), (3, C))
                )(jnp.clip(base + d, 0, V))
                acc = acc + x
            return acc

        @jax.jit
        def slice_sel_mm(feats, base, pos, w):
            acc = jnp.zeros((V, C), jnp.float32)
            wg = w.reshape(3 * C, C)
            for d in range(DEPTH):
                x = jax.vmap(
                    lambda i: jax.lax.dynamic_slice(feats, (i, 0), (3, C))
                )(jnp.clip(base + d, 0, V))          # (V, 3, C)
                sel = (pos[None, :, :].transpose(2, 1, 0)
                       == jnp.arange(3)[None, None, :])  # (V, 3s, 3e)
                y = jnp.einsum("vse,vsc->vec", sel.astype(jnp.float32), x)
                acc = acc + jax.lax.dot_general(
                    y.reshape(V, 3 * C), wg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return acc

        @jax.jit
        def rowg_mm(feats, base, w):
            acc = jnp.zeros((V, C), jnp.float32)
            for d in range(DEPTH):
                for s in range(3):
                    x = feats[jnp.clip(base + s + d, 0, V)]
                    acc = acc + jax.lax.dot_general(
                        x, w[s], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            return acc

        t_row = bench(rowgather, feats, base) / DEPTH
        t_slice = bench(slicegather, feats, base) / DEPTH
        t_ssmm = bench(slice_sel_mm, feats, base, pos, w) / DEPTH
        t_rgmm = bench(rowg_mm, feats, base, w) / DEPTH
        gb = 3 * V * C * 4 / 1e9
        print(f"{label} V={V} C={C} ({C*4}B rows, {3*C*4}B slices): "
              f"rowgather {t_row:.2f} ms ({gb/t_row*1e3:.0f} GB/s) | "
              f"slicegather {t_slice:.2f} ms ({gb/t_slice*1e3:.0f} GB/s) | "
              f"slice+sel+mm {t_ssmm:.2f} ms | rowg+mm {t_rgmm:.2f} ms")

        # bf16 variants
        fb = feats.astype(jnp.bfloat16)

        @jax.jit
        def slice_bf16(feats, base):
            acc = jnp.zeros((V, 3, C), jnp.float32)
            for d in range(DEPTH):
                x = jax.vmap(
                    lambda i: jax.lax.dynamic_slice(feats, (i, 0), (3, C))
                )(jnp.clip(base + d, 0, V))
                acc = acc + x.astype(jnp.float32)
            return acc

        t_sb = bench(slice_bf16, fb, base) / DEPTH
        print(f"    bf16 slicegather {t_sb:.2f} ms "
              f"({gb/2/t_sb*1e3:.0f} GB/s eff)")


if __name__ == "__main__":
    main()
