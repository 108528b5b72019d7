"""Per-stage sparse_conv timing, f32 vs bf16-resident features.

Times, at each ResNet stage shape (V, C), on realistic clustered voxels:
  map    — kernel_map build (z-run double-sort)
  conv32 — sparse_conv with f32-resident features
  conv16 — sparse_conv with bf16-resident features (storage + gather in
           bf16, f32 accumulation) — the round-3 backbone residency design

Usage: python tools/stage_conv_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))

    from vdetr_tpu.ops.sparse_conv import attach_kernel_map, kernel_map, \
        sparse_conv
    from vdetr_tpu.ops.voxelize import voxelize

    def fence(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    def bench(f, *args, iters=8):
        out = f(*args)
        fence(out)
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        return (time.time() - t0) / iters * 1000

    rng = np.random.RandomState(0)
    for V, C, vsize in ((65536, 64, 0.02), (32768, 128, 0.04),
                        (16384, 256, 0.08), (8192, 512, 0.16)):
        # clustered surface-ish points: a few hundred planar patches
        npatch = 160
        centers = rng.rand(npatch, 3) * np.array([7.0, 6.0, 2.8])
        pts = []
        per = V // npatch + 1
        for c in centers:
            u = rng.randn(per, 3).astype(np.float32)
            u[:, 2] *= 0.05  # flatten: surface patch
            pts.append(c + u * 0.6)
        pts = np.concatenate(pts)[:V][None].astype(np.float32)
        # voxelize with C=3 (the real pipeline's color width — carrying C
        # wide features through _compact_unique's multi-operand sort is
        # pathological), then install random (V, C) features directly
        grid = voxelize(jnp.asarray(pts),
                        jnp.asarray(pts),
                        jnp.ones((1, V), bool), voxel_size=vsize,
                        capacity=V)
        feats = rng.rand(1, V, C).astype(np.float32)
        grid = grid.replace(
            features=jnp.asarray(feats) * grid.valid[..., None])
        fence(grid.keys)
        nval = int(np.asarray(grid.valid.sum()))
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05)

        t_map = bench(jax.jit(lambda g: kernel_map(g, 3)), grid)
        # eager map so this micro measures the XLA gather path
        g = attach_kernel_map(grid, eager_map=True)
        g = g.replace(win_blk=None, wk_qkey=None, wk_mask=None,
                      wk_lazy_nbr=None, win_ovf=None, fix_rows=None,
                      fix_nbr=None, win_geom=None)
        fence(g.nbr_idx)

        conv32 = jax.jit(lambda g, w: sparse_conv(g, w, 3).features)
        t32 = bench(conv32, g, w)

        g16 = g.replace(features=g.features.astype(jnp.bfloat16))
        fence(g16.features)
        conv16 = jax.jit(lambda g, w: sparse_conv(
            g, w, 3, compute_dtype=jnp.bfloat16).features)
        t16 = bench(conv16, g16, w)

        gb = 27 * V * C * 4 / 1e9
        print(f"V={V} C={C} valid={nval}: map {t_map:.2f} ms | "
              f"conv f32 {t32:.2f} ms ({gb/t32*1e3:.0f} GB/s) | "
              f"conv bf16-res {t16:.2f} ms ({gb/2/t16*1e3:.0f} GB/s eff)",
              flush=True)


if __name__ == "__main__":
    main()
