"""On-chip forward-fault bisection: run the published-size eval forward
stage by stage (VDETR debug_stop) with REAL synchronization (host
transfer — jax.block_until_ready does not wait on the axon backend) and
report which stage first crashes the TPU worker.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/fwd_bisect.py \
           [stage ...]    # default: 1 2 3 4 5 0  (0 = full forward)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_comp")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vdetr_tpu.config import VDETRConfig
    from vdetr_tpu.data import ScannetDatasetConfig
    from vdetr_tpu.models import build_model

    stages = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5, 0]
    cfg = VDETRConfig(
        num_points=int(os.environ.get("FB_NUM_POINTS", "100000")),
        voxel_capacity=int(os.environ.get("FB_VOXEL_CAP", "131072")),
        dec_nlayers=int(os.environ.get("FB_DEC_NLAYERS", "9")),
        fps_impl=os.environ.get("FB_FPS_IMPL", "auto"),
    )
    ds = ScannetDatasetConfig()
    model = build_model(cfg, ds)
    if os.environ.get("FB_UNIFORM"):
        # uniform-random clutter: the adversarial layout (every window
        # overflows, kernels fall back) — useful for fault bisection
        rng = np.random.RandomState(0)
        pts = rng.rand(1, cfg.num_points, 3).astype(np.float32) * np.array(
            [6.0, 5.0, 2.8], np.float32
        )
    else:
        # realistic surface-scan density (data/synthetic.py)
        from vdetr_tpu.data.synthetic import SyntheticDetectionDataset

        scene = SyntheticDetectionDataset(
            ds, num_points=cfg.num_points, num_scenes=1)[0]
        pts = scene["point_clouds"][None]
    inputs = {
        "point_clouds": jnp.asarray(pts),
        "point_cloud_dims_min": jnp.asarray(pts.min(1)),
        "point_cloud_dims_max": jnp.asarray(pts.max(1)),
    }
    t0 = time.time()
    variables = jax.jit(
        lambda r, i: model.init(r, i, train=False)
    )(jax.random.PRNGKey(0), inputs)
    np.asarray(jax.tree.leaves(variables)[0].ravel()[0])
    print(f"init {time.time()-t0:.1f}s", flush=True)

    for k in stages:
        fn = jax.jit(functools.partial(model.apply, train=False,
                                       debug_stop=k))
        label = f"stage {k}" if k else "full fwd"
        ok = False
        for attempt in range(2):
            try:
                t0 = time.time()
                out = fn(variables, inputs)
                leaf = jax.tree.leaves(out)[0]
                val = float(np.asarray(leaf.ravel()[0]))
                dt = time.time() - t0
                # timed re-run with sync (compile cached now)
                t0 = time.time()
                out = fn(variables, inputs)
                float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
                dt2 = time.time() - t0
                print(f"[{label}] PASS first={dt:.1f}s warm={dt2*1000:.1f}ms"
                      f" digest={val:.4e}", flush=True)
                ok = True
                break
            except Exception as e:
                msg = str(e).splitlines()[0][:110]
                print(f"[{label}] attempt {attempt}: FAIL {msg}", flush=True)
                time.sleep(20)
        if not ok:
            print(f"[{label}] FAILED — first faulting stage", flush=True)
            return 1
    print("ALL STAGES PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
