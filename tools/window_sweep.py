"""Sweep (tile, wb) for the windowed conv kernel per stage shape.

Reports forward time and overflow per config (overflow => that config
would fall back to XLA on such scenes; its timing still measures the
kernel branch cost via direct window_conv invocation).

Usage: python tools/window_sweep.py
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

    from vdetr_tpu.ops.sparse_conv import kernel_map
    from vdetr_tpu.ops.sparse_conv_kernel import (build_window_map,
                                                  window_conv)
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
        feats = jnp.asarray(rng.rand(1, V, C).astype(np.float32))
        feats = feats * grid.valid[..., None]
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05)
        nbr = kernel_map(grid, 3)
        fence(nbr)

        for tile, wb in ((256, 128), (256, 256), (512, 256),
                         (512, 512), (128, 128)):
            if V % tile:
                continue
            try:
                blk, le, ovf = jax.vmap(
                    lambda n: build_window_map(n, V, tile, wb))(nbr)
                ov = bool(np.asarray(ovf).any())
                f = jax.jit(lambda fe, b, l, w: window_conv(
                    fe, b, l, w, tile=tile, wb=wb))
                t = bench(f, feats, blk, le, w)
                print(f"V={V} C={C} tile={tile} wb={wb}: {t:.2f} ms "
                      f"ovf={ov}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"V={V} C={C} tile={tile} wb={wb}: "
                      f"ERROR {str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
