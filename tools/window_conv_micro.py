"""On-chip micro: windowed one-hot Mosaic conv vs XLA gather conv.

Per ResNet stage shape, on clustered surface-like voxels: compiled
parity + timing of forward, and of a fwd+bwd step (grads wrt feats and
weights) for the training path.

Usage: python tools/window_conv_micro.py
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

    from vdetr_tpu.ops import sparse_conv as sc
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
                        (16384, 256, 0.08)):
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
        feats = rng.rand(1, V, C).astype(np.float32)
        grid = grid.replace(
            features=jnp.asarray(feats) * grid.valid[..., None])
        fence(grid.keys)
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05)

        attach_plain = jax.jit(
            lambda g: sc.attach_kernel_map(g, eager_map=True).replace(
                win_blk=None, wk_qkey=None, wk_mask=None,
                wk_lazy_nbr=None, win_ovf=None, fix_rows=None,
                fix_nbr=None, win_geom=None))
        attach_keyed = jax.jit(lambda g: sc.attach_kernel_map(g))
        g_plain = attach_plain(grid)
        g_win = attach_keyed(grid)
        fence(g_plain.nbr_idx)
        ovf = bool(np.asarray(g_win.win_ovf).any()) \
            if g_win.win_ovf is not None else None
        if g_win.wk_qkey is None:
            print(f"V={V}: keyed geometry not attached "
                  f"(backend {jax.default_backend()})", flush=True)
            continue
        t_ap = bench(attach_plain, grid)
        t_ak = bench(attach_keyed, grid)

        conv_x = jax.jit(lambda g, w: sc.sparse_conv(g, w).features)
        ref = np.asarray(conv_x(g_plain, w))
        got = np.asarray(conv_x(g_win, w))
        err = float(np.abs(ref - got).max() / np.abs(ref).max())

        t_x = bench(conv_x, g_plain, w)
        t_k = bench(conv_x, g_win, w)

        def train_loss(g, w):
            out = sc.sparse_conv(g, w).features
            return (out * out).sum()

        gx = jax.jit(jax.grad(train_loss, argnums=1))
        t_xg = bench(gx, g_plain, w)
        t_kg = bench(gx, g_win, w)
        gw_ref = np.asarray(gx(g_plain, w))
        gw_ker = np.asarray(gx(g_win, w))
        gerr = float(np.abs(gw_ref - gw_ker).max()
                     / max(1e-6, np.abs(gw_ref).max()))

        print(f"V={V} C={C} ovf={ovf}: attach map {t_ap:.2f} ms | "
              f"attach keyed {t_ak:.2f} ms || fwd xla {t_x:.2f} ms | "
              f"fwd kernel {t_k:.2f} ms | relerr {err:.2e} || "
              f"grad xla {t_xg:.2f} ms | grad kernel {t_kg:.2f} ms | "
              f"dW relerr {gerr:.2e}", flush=True)


if __name__ == "__main__":
    main()
