"""Run a VDETR forward pass on a synthetic scene and print detections.

Usage: python examples/forward_synthetic.py [--full-size]

Small config by default so it runs in seconds on CPU; --full-size uses the
published ScanNet architecture (slow to compile on CPU; meant for TPU).
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS", "") == "axon" and "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    from jax._src import xla_bridge

    xla_bridge._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.models import build_model


def main():
    full = "--full-size" in sys.argv
    if full:
        cfg = VDETRConfig(fps_impl="auto")
        N = 100000
    else:
        cfg = VDETRConfig(
            voxel_capacity=4096, min_stage_capacity=128,
            grid_extent=(256, 256, 128), preenc_npoints=256, nqueries=128,
            dec_nlayers=3, dec_dim=64, dec_ffn_dim=64, rpe_dim=32,
            inplanes=16, enc_dim=64, fps_impl="jax", num_points=4096,
        )
        N = 4096

    rng = np.random.RandomState(0)
    # a room with a box-shaped "object" cluster
    pts = rng.rand(N, 3).astype(np.float32) * [4.0, 4.0, 2.5]
    pts[: N // 4] = rng.rand(N // 4, 3).astype(np.float32) * 0.8 + [1.0, 1.0, 0.0]
    inputs = {
        "point_clouds": jnp.asarray(pts[None]),
        "point_cloud_dims_min": jnp.asarray(pts.min(0)[None]),
        "point_cloud_dims_max": jnp.asarray(pts.max(0)[None]),
    }
    model = build_model(cfg, ScannetDatasetConfig())
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params/1e6:.2f}M")
    out = jax.jit(lambda v, i: model.apply(v, i, train=False))(variables,
                                                              inputs)
    final = out["outputs"]
    obj = np.asarray(final["objectness_prob"][0])
    order = np.argsort(-obj)[:5]
    print("top-5 proposals (untrained weights):")
    for i in order:
        c = np.asarray(final["center_unnormalized"][0, i])
        s = np.asarray(final["size_unnormalized"][0, i])
        print(f"  obj={obj[i]:.3f} center=({c[0]:.2f},{c[1]:.2f},{c[2]:.2f})"
              f" size=({s[0]:.2f},{s[1]:.2f},{s[2]:.2f})")
    print("aux layers:", len(out["aux_outputs"]),
          "| seeds:", out["seed_xyz"].shape[1])


if __name__ == "__main__":
    main()
