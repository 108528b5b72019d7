"""Map the on-chip fault boundary: run eval-forward and train-forward /
backward at a ladder of (num_points, voxel_capacity) sizes, retrying each
once to filter transient tunnel faults. Each rung runs in-process (one
process, sizes ascending) so a mid-ladder wedge is visible in the log.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/size_ladder.py \
           [eval|train_fwd|grad] [ladder indices...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LADDER = [
    (25000, 32768),
    (50000, 65536),
    (75000, 98304),
    (100000, 131072),
]


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_comp")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vdetr_tpu.config import VDETRConfig
    from vdetr_tpu.data import ScannetDatasetConfig
    from vdetr_tpu.data.synthetic import SyntheticDetectionDataset, collate
    from vdetr_tpu.models import build_model
    from vdetr_tpu.train.criterion import build_criterion
    from vdetr_tpu.train.engine import _model_inputs

    mode = sys.argv[1] if len(sys.argv) > 1 else "train_fwd"
    rungs = [int(a) for a in sys.argv[2:]] or list(range(len(LADDER)))
    ds = ScannetDatasetConfig()

    fps_impl = os.environ.get("VDETR_FPS_IMPL", "auto")
    for r in rungs:
        n_pts, vcap = LADDER[r]
        cfg = VDETRConfig(num_points=n_pts, voxel_capacity=vcap,
                          fps_impl=fps_impl)
        model = build_model(cfg, ds)
        data = SyntheticDetectionDataset(ds, num_points=n_pts,
                                         num_scenes=2, max_objects=12)
        batch = {k: jnp.asarray(v) for k, v in collate([data[0]]).items()}
        criterion = build_criterion(cfg, ds)
        variables = jax.jit(
            lambda rr, inp: model.init(rr, inp, train=False)
        )(jax.random.PRNGKey(0), _model_inputs(batch))
        jax.block_until_ready(variables)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        rng = jax.random.PRNGKey(1)

        def eval_fwd(params):
            out = model.apply({"params": params, "batch_stats": stats},
                              _model_inputs(batch), train=False)
            return sum(jnp.sum(x * x) for x in jax.tree.leaves(out)
                       if x.dtype == jnp.float32)

        def train_fwd(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": stats},
                _model_inputs(batch), train=True, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            leaves = jax.tree.leaves(
                {"o": out["outputs"], "a": out["aux_outputs"]}
            )
            return sum(jnp.sum(x * x) for x in leaves
                       if x.dtype == jnp.float32)

        def crit(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": stats},
                _model_inputs(batch), train=True, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return criterion(out, batch)[0]

        fns = {"eval": jax.jit(eval_fwd),
               "train_fwd": jax.jit(train_fwd),
               "grad": jax.jit(jax.grad(crit))}
        fn = fns[mode]
        for attempt in range(2):
            try:
                for i in range(3):
                    t0 = time.time()
                    out = fn(params)
                    # host transfer: block_until_ready does not actually
                    # wait on the axon remote backend
                    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
                    print(f"[{mode}] rung {r} N={n_pts} V={vcap} "
                          f"iter {i}: {time.time()-t0:.2f}s", flush=True)
                print(f"[{mode}] rung {r}: PASS", flush=True)
                break
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print(f"[{mode}] rung {r} attempt {attempt}: FAIL {msg}",
                      flush=True)
                time.sleep(10)
    print("LADDER DONE", flush=True)


if __name__ == "__main__":
    main()
