"""Per-level backbone cost attribution: geometry vs kernel vs norm.

backbone_decomp.py times stage prefixes; this tool splits ONE level's
cost into its structural parts so optimization targets the right thing:

  down     downsample_grid(grid, cap)      (site computation, sorts)
  attach   attach_kernel_map(out_grid)     (window geometry + fix plan)
  sconv    SparseConvDown k3 s2            (incl. its inline geometry)
  conv     submanifold keyed conv C->C     (geometry pre-attached)
  bn+relu  MaskedBatchNorm + relu at (V, C)

Levels follow the published ResNet34 ladder on a realistic clustered
scene (same construction as backbone_decomp.py).

Usage: python tools/level_decomp.py
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vdetr_tpu.config import VDETRConfig
    from vdetr_tpu.data import ScannetDatasetConfig
    from vdetr_tpu.data.synthetic import SyntheticDetectionDataset
    from vdetr_tpu.models.backbone import SparseConvDown
    from vdetr_tpu.models.norm import MaskedBatchNorm
    from vdetr_tpu.ops.sparse_conv import attach_kernel_map, sparse_conv
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
        return (time.time() - t0) / iters * 1000

    cfg = VDETRConfig()
    ds = ScannetDatasetConfig()
    scene = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                      num_scenes=1)[0]
    pts = jnp.asarray(scene["point_clouds"][None])
    valid = jnp.ones(pts.shape[:2], bool)
    grid = jax.jit(lambda p, v: voxelize(
        p, p, v, cfg.voxel_size, cfg.voxel_capacity,
        extent=cfg.grid_extent))(pts, valid)
    fence(grid.keys)

    rng = np.random.RandomState(0)
    caps = [cfg.voxel_capacity // 2 ** i for i in range(1, 6)]
    chans = [64, 64, 128, 256, 512]  # feature width AT each level
    g = grid
    print(f"input level: V={g.keys.shape[1]} "
          f"valid={int(np.asarray(g.valid.sum()))}", flush=True)

    # input-level attach (the stem's submanifold geometry is never used,
    # but sparse_conv_down builds its own inline — time attach for scale)
    t = bench(jax.jit(lambda gg: attach_kernel_map(gg).wk_qkey), g)
    print(f"  attach@{g.keys.shape[1]}: {t:.2f} ms", flush=True)

    for lvl, (cap, C) in enumerate(zip(caps, chans)):
        down = jax.jit(lambda gg, c=cap: downsample_grid(gg, c).keys)
        t_down = bench(down, g)
        out_grid = jax.jit(lambda gg, c=cap: downsample_grid(gg, c))(g)
        t_attach = bench(
            jax.jit(lambda gg: attach_kernel_map(gg).wk_qkey), out_grid)
        gm = jax.jit(attach_kernel_map)(out_grid)
        fence(gm.keys)

        # strided conv from the PREVIOUS level's width into C
        Cin = 3 if lvl == 0 else chans[lvl - 1]
        f_in = jnp.asarray(
            rng.rand(1, g.keys.shape[1], Cin).astype(np.float32))
        g_in = g.replace(features=f_in * g.valid[..., None])
        sconv = SparseConvDown(C, cap, kernel_size=3)
        vs = jax.jit(lambda gg: sconv.init(jax.random.PRNGKey(0), gg))(g_in)
        t_sconv = bench(
            jax.jit(lambda v_, gg: sconv.apply(v_, gg).features), vs, g_in)

        # submanifold conv C->C at this level, geometry prebuilt
        V = gm.keys.shape[1]
        fe = jnp.asarray(rng.rand(1, V, C).astype(np.float32))
        gm_f = gm.replace(features=fe * gm.valid[..., None])
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05)
        t_conv = bench(
            jax.jit(lambda gg, ww: sparse_conv(gg, ww).features), gm_f, w)

        bn = MaskedBatchNorm(C, use_running_average=True)
        vb = bn.init(jax.random.PRNGKey(0), gm_f.features, gm_f.valid)
        t_bn = bench(jax.jit(
            lambda v_, f_, m_: jax.nn.relu(bn.apply(v_, f_, m_))),
            vb, gm_f.features, gm_f.valid)

        nv = int(np.asarray(gm.valid.sum()))
        print(f"level {lvl + 1}: V={V} valid={nv} C={C} | "
              f"down {t_down:.2f} | attach {t_attach:.2f} | "
              f"sconv(k3s2,{Cin}->{C}) {t_sconv:.2f} | "
              f"conv({C}->{C}) {t_conv:.2f} | bn+relu {t_bn:.2f} ms",
              flush=True)
        g = gm


if __name__ == "__main__":
    main()
