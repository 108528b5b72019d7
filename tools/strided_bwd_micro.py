"""Strided-conv backward cost: keyed forward + lazily-mapped gather vjp.

The 5 stride-2 convs are the only convs whose backward still rebuilds a
(27, V_out) neighbor map and replays the XLA gather/scatter vjp
(ops/sparse_conv_keyed.py:_kcf_bwd). This micro times, per stage shape,
jitted on one realistic scene:

  fwd        SparseConvDown forward
  fwd+bwd    value_and_grad wrt (features, weights)

The diff isolates what the strided backward costs the train step; the
per-dispatch overhead of the remote backend cancels in the diff.

Usage: python tools/strided_bwd_micro.py
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
    g = jax.jit(lambda p, v: voxelize(
        p, p, v, cfg.voxel_size, cfg.voxel_capacity,
        extent=cfg.grid_extent))(pts, valid)
    fence(g.keys)

    rng = np.random.RandomState(0)
    caps = [cfg.voxel_capacity // 2 ** i for i in range(1, 6)]
    cins = [3, 64, 64, 128, 256]
    couts = [64, 64, 128, 256, 512]
    tot = 0.0
    for lvl, (cap, Cin, Co) in enumerate(zip(caps, cins, couts)):
        f_in = jnp.asarray(
            rng.rand(1, g.keys.shape[1], Cin).astype(np.float32))
        g_in = g.replace(features=f_in * g.valid[..., None])
        sconv = SparseConvDown(Co, cap, kernel_size=3)
        vs = jax.jit(lambda gg: sconv.init(jax.random.PRNGKey(0), gg))(g_in)

        fwd = jax.jit(lambda v_, gg: sconv.apply(v_, gg).features.sum())
        t_f = bench(fwd, vs, g_in)

        vg = jax.jit(jax.value_and_grad(
            lambda v_, gg: sconv.apply(v_, gg).features.sum(),
            argnums=(0,)))
        t_fb = bench(vg, vs, g_in)
        print(f"level {lvl + 1}: Vin={g_in.keys.shape[1]} -> {cap} "
              f"{Cin}->{Co} | fwd {t_f:.2f} | fwd+bwd {t_fb:.2f} | "
              f"bwd ~= {t_fb - t_f:.2f} ms", flush=True)
        tot += t_fb - t_f
        g = jax.jit(lambda gg, c=cap: downsample_grid(gg, c))(g)
        fence(g.keys)
    print(f"total strided bwd across stages ~= {tot:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
