"""In-model backbone decomposition on a realistic scene.

Voxelizes one dense synthetic scene at the published config, then times
cumulative prefixes: voxelize | +stem | +layer1..4 | +FPN, and reports
each level's window-overflow flag (overflow => that level's submanifold
convs fell back to the XLA gather path).

Usage: python tools/backbone_decomp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))

    from vdetr_tpu.config import VDETRConfig
    from vdetr_tpu.data import ScannetDatasetConfig
    from vdetr_tpu.data.synthetic import SyntheticDetectionDataset
    from vdetr_tpu.models.backbone import (FPNOutBlock, FPNUpBlock,
                                           SparseBasicBlock, SparseConvDown,
                                           SparseResNet)
    from vdetr_tpu.models.norm import MaskedBatchNorm
    from vdetr_tpu.ops.sparse_conv import attach_kernel_map
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

    cfg = VDETRConfig()
    ds = ScannetDatasetConfig()
    scene = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                      num_scenes=1)[0]
    pts = jnp.asarray(scene["point_clouds"][None])
    valid = jnp.ones(pts.shape[:2], bool)

    vox = jax.jit(lambda p, v: voxelize(
        p, p, v, cfg.voxel_size, cfg.voxel_capacity,
        extent=cfg.grid_extent))
    grid = vox(pts, valid)
    fence(grid.keys)
    t_vox = bench(vox, pts, valid)
    print(f"voxelize: {t_vox:.1f} ms  (valid "
          f"{int(np.asarray(grid.valid.sum()))}/{cfg.voxel_capacity})",
          flush=True)

    model = SparseResNet(depth=cfg.depth, inplanes=cfg.inplanes,
                         stage_capacities=tuple(
                             cfg.voxel_capacity // 2 ** i
                             for i in range(1, 6)))

    vs = jax.jit(lambda g: model.init(jax.random.PRNGKey(0), g))(grid)
    fence(jax.tree.leaves(vs)[0])

    prev = t_vox
    # stage-by-stage via num_stages variants would re-init params;
    # instead time the full backbone and per-level overflow flags
    full = jax.jit(lambda g: [o.features.sum() for o in model.apply(vs, g)])
    t_bb = bench(full, grid)
    print(f"backbone (stem+4 layers): {t_bb:.1f} ms", flush=True)

    # per-stage attribution: time prefixes (XLA DCE prunes the unused
    # deeper stages since only outs[k] is consumed), diff consecutive
    # prefixes. Prefix 0 = stem only (outs[0] depends on stem + layer1;
    # to isolate the stem, sum the stem grid's features via num_stages=0
    # is not expressible — report prefixes instead).
    prev_t = 0.0
    for k in range(4):
        pref = jax.jit(
            lambda g, k=k: model.apply(vs, g)[k].features.sum())
        t_k = bench(pref, grid)
        print(f"  prefix stem..layer{k + 1}: {t_k:.1f} ms "
              f"(layer{k + 1} ~= {t_k - prev_t:+.1f} ms)", flush=True)
        prev_t = t_k

    # per-level overflow flags
    outs = model.apply(vs, grid)
    for i, o in enumerate(outs):
        g2 = attach_kernel_map(o.replace(nbr_idx=None, win_blk=None,
                                         wk_qkey=None, wk_mask=None,
                                         wk_lazy_nbr=None, win_ovf=None,
                                         win_geom=None))
        ov = (bool(np.asarray(g2.win_ovf).any())
              if g2.win_ovf is not None else "n/a")
        print(f"  stage{i+1}: V={o.keys.shape[1]} "
              f"valid={int(np.asarray(o.valid.sum()))} overflow={ov}",
              flush=True)

    # the stem's input-level map (131072 sites)
    g1 = attach_kernel_map(grid)
    ov = (bool(np.asarray(g1.win_ovf).any())
          if g1.win_ovf is not None else "n/a")
    print(f"  input level: V={grid.keys.shape[1]} "
          f"valid={int(np.asarray(grid.valid.sum()))} overflow={ov}",
          flush=True)


if __name__ == "__main__":
    main()
