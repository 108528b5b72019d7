"""On-chip A/B: windowed Mosaic map kernel (ops/map_kernel.py) vs the
z-run double-sort path (sparse_conv._zrun_neighbors) at the four
backbone level sizes on realistic-density clustered scenes.

Also reports bad-row counts (fix-up pressure) and verifies exact parity
on the chip (compiled Mosaic, not interpret).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/map_kernel_micro.py
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

    from vdetr_tpu.ops import map_kernel as mk
    from vdetr_tpu.ops import sparse_conv as sc
    from vdetr_tpu.ops.voxelize import downsample_grid, voxelize

    def fence(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    def bench(f, *args, iters=8):
        out = f(*args)
        fence(out)
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        return (time.time() - t0) / iters * 1000, out

    rng = np.random.RandomState(0)

    def scene(V, vsize):
        npatch = 160
        centers = rng.rand(npatch, 3) * np.array([7.0, 6.0, 2.8])
        pts = []
        per = V // npatch + 1
        for c in centers:
            u = rng.randn(per, 3).astype(np.float32)
            u[:, 2] *= 0.1
            pts.append(c + u * 0.55)
        pts = np.concatenate(pts)[:V][None].astype(np.float32)
        return voxelize(jnp.asarray(pts), jnp.asarray(pts),
                        jnp.ones((1, V), bool), voxel_size=vsize,
                        capacity=V)

    @jax.jit
    def sort_map(coords, keys, valid, extent):
        raise RuntimeError  # placeholder; per-extent closures below

    for V, vsize in ((65536, 0.02), (32768, 0.04), (16384, 0.08),
                     (8192, 0.16)):
        grid = scene(V, vsize)

        def sort_path(g=grid):
            return jax.vmap(
                lambda c, k, v: sc._zrun_neighbors(k, c, v, g.extent, 1)
            )(g.coords, g.keys, g.valid)

        sp = jax.jit(sort_path)
        t_sort, ref = bench(sp)

        km = jax.jit(lambda g=grid: mk.stencil_map(
            g.keys, g.coords, g.valid, g.extent))
        t_kern, (got, n_unp) = bench(km)

        bad = jax.jit(lambda g=grid: mk.stencil_map(
            g.keys, g.coords, g.valid, g.extent)[1])
        eq = bool((np.asarray(ref) == np.asarray(got)).all())
        print(f"V={V:6d} submanifold sort={t_sort:7.2f} ms "
              f"kernel={t_kern:7.2f} ms unpatched={int(n_unp)} "
              f"parity={'OK' if eq else 'FAIL'}", flush=True)

        # stride-2 map (input V -> output V/2)
        og = downsample_grid(grid, V // 2)

        def sort2(g=grid, o=og):
            return jax.vmap(
                lambda oc, ov, ik: sc._zrun_neighbors(
                    ik, oc * 2, ov, g.extent, 1)
            )(o.coords, o.valid, g.keys)

        t2s, ref2 = bench(jax.jit(sort2))
        km2 = jax.jit(lambda g=grid, o=og: mk.stencil_map(
            g.keys, o.coords * 2, o.valid, g.extent))
        t2k, (got2, n2) = bench(km2)
        eq2 = bool((np.asarray(ref2) == np.asarray(got2)).all())
        print(f"V={V:6d} stride-2    sort={t2s:7.2f} ms "
              f"kernel={t2k:7.2f} ms unpatched={int(n2)} "
              f"parity={'OK' if eq2 else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
