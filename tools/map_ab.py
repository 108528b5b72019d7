"""A/B: z-run kernel map (round-3) vs plain 27-query lookup map (round-2).

The z-run map does a 10V-row double-sort plus 27V single-int32 window
gathers; the plain map does a 28V-row double-sort and no gathers. Which
wins on the real chip at stage sizes?
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

    from vdetr_tpu.ops.sparse_conv import _offsets, kernel_map
    from vdetr_tpu.ops.voxelize import (KEY_SENTINEL, lookup, pack_keys,
                                        voxelize)

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

    def plain_map(grid):
        offs = jnp.asarray(_offsets(3), jnp.int32)

        def one(coords, keys, valid):
            q = coords[None, :, :] + offs[:, None, :]
            qk = jnp.where(valid[None, :], pack_keys(q, grid.extent),
                           KEY_SENTINEL)
            return lookup(keys, qk)

        return jax.vmap(one)(grid.coords, grid.keys, grid.valid)

    rng = np.random.RandomState(0)
    for V, vsize in ((65536, 0.02), (32768, 0.04), (16384, 0.08),
                     (8192, 0.16)):
        npatch = 160
        centers = rng.rand(npatch, 3) * np.array([7.0, 6.0, 2.8])
        pts = []
        per = V // npatch + 1
        for c in centers:
            u = rng.randn(per, 3).astype(np.float32)
            u[:, 2] *= 0.05
            pts.append(c + u * 0.6)
        pts = np.concatenate(pts)[:V][None].astype(np.float32)
        grid = voxelize(jnp.asarray(pts), jnp.asarray(pts),
                        jnp.ones((1, V), bool), voxel_size=vsize,
                        capacity=V)
        fence(grid.keys)

        zrun = jax.jit(lambda g: kernel_map(g, 3))
        plain = jax.jit(plain_map)
        a = np.asarray(zrun(grid))
        b = np.asarray(plain(grid))
        match = bool((a == b).all())
        t_z = bench(zrun, grid)
        t_p = bench(plain, grid)
        print(f"V={V}: zrun {t_z:.2f} ms | plain {t_p:.2f} ms | "
              f"parity={match}", flush=True)


if __name__ == "__main__":
    main()
