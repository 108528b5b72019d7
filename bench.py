"""Benchmark: forward throughput (scenes/sec/chip) on the published
ScanNet-val configuration (100k-point scenes, 4096 seeds, 1024 queries,
ResNet34 backbone, 9-layer decoder), synthetic input.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no throughput (SURVEY.md §6); the
target in BASELINE.json is ">= 5x A100 scenes/sec/chip". We assume the
reference single-A100 eval forward runs ~10 scenes/sec (typical for
MinkowskiEngine+DETR pipelines at 100k points) and report
value / (5 * 10), i.e. vs_baseline >= 1.0 means the 5x-A100 target is met
under that assumption.
"""

import json
import os
import sys
import time

import numpy as np

ASSUMED_A100_SCENES_PER_SEC = 10.0
TARGET_MULTIPLIER = 5.0


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: full-model XLA compiles take ~10 min
    # over the axon remote-compile tunnel; cache them across runs
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_comp")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from vdetr_tpu.config import VDETRConfig
    from vdetr_tpu.data import ScannetDatasetConfig
    from vdetr_tpu.models import build_model

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        cfg = VDETRConfig()
        N = cfg.num_points
        batch = 1
        iters = 20
    else:  # CPU smoke mode
        cfg = VDETRConfig(
            voxel_capacity=8192, min_stage_capacity=256,
            grid_extent=(512, 512, 256), preenc_npoints=512, nqueries=256,
            dec_nlayers=3, inplanes=16, fps_impl="jax", num_points=20000,
        )
        N = cfg.num_points
        batch = 1
        iters = 3

    rng = np.random.RandomState(0)

    def make_inputs():
        pts = rng.rand(batch, N, 3).astype(np.float32) * np.array(
            [6.0, 5.0, 2.8], np.float32
        )
        return {
            "point_clouds": jnp.asarray(pts),
            "point_cloud_dims_min": jnp.asarray(pts.min(1)),
            "point_cloud_dims_max": jnp.asarray(pts.max(1)),
        }

    # distinct inputs per step: guards against any runtime-level caching /
    # dedup of identical executions
    input_sets = None
    inputs = make_inputs()
    model = build_model(cfg, ScannetDatasetConfig())
    t0 = time.time()
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    fwd = jax.jit(lambda v, i: model.apply(v, i, train=False))
    out = fwd(variables, inputs)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    input_sets = [make_inputs() for _ in range(4)]
    for i in input_sets:
        jax.block_until_ready(fwd(variables, i))  # warm transfer paths
    t0 = time.time()
    outs = []
    for it in range(iters):
        outs.append(fwd(variables, input_sets[it % 4]))
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    scenes_per_sec = batch / dt

    print(json.dumps({
        "metric": "scannet_eval_forward_throughput",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(
            scenes_per_sec / (TARGET_MULTIPLIER * ASSUMED_A100_SCENES_PER_SEC),
            3,
        ),
        "detail": {
            "backend": jax.default_backend(),
            "num_points": N,
            "batch": batch,
            "step_ms": round(dt * 1000, 2),
            "compile_s": round(compile_s, 1),
        },
    }))


if __name__ == "__main__":
    main()
