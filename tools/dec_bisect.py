"""Decoder-side backward cost bisection on the real chip.

grad_bisect.py showed the post-backbone region (FPS + proj/heads +
decoder) dominates the train step (311 of 571 ms fwd+bwd). This tool
splits it further:

  s3     grad of backbone+FPN digest            (baseline)
  s4     grad of +FPS digest                    (s4 - s3 = FPS bwd)
  s5     grad of +proj/pointcls/anchors digest  (s5 - s4 = heads)
  d1/d5/d9  grad of full forward at dec_nlayers = 1/5/9
         (slope = per-decoder-layer fwd+bwd cost; d1 - s5 = layer-0
          FFN + heads0 + top-k + aux assembly)

Usage: python tools/dec_bisect.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(iters: int = 6):
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
    from vdetr_tpu.train.engine import _model_inputs

    ds = ScannetDatasetConfig()
    scenes = SyntheticDetectionDataset(
        ds, num_points=VDETRConfig().num_points, num_scenes=1)
    batch = {k: jnp.asarray(v) for k, v in collate([scenes[0]]).items()}
    inputs = _model_inputs(batch)
    drng = jax.random.PRNGKey(1)

    def fence(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    results = {}

    def bench(label, fn, params):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(params)
        fence(out)
        first = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = f(params)
        fence(out)
        dt = (time.time() - t0) / iters * 1000
        print(f"[{label:4s}] first={first:.1f}s warm={dt:.1f}ms", flush=True)
        results[label] = dt
        return dt

    def setup(nlayers):
        cfg = VDETRConfig(dec_nlayers=nlayers)
        model = build_model(cfg, ds)
        variables = jax.jit(
            lambda r, i: model.init(r, i, train=False)
        )(jax.random.PRNGKey(0), inputs)
        fence(variables)
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        def apply(p, debug_stop=0):
            out, _ = model.apply(
                {"params": p, "batch_stats": stats}, inputs, train=True,
                rngs={"dropout": drng}, mutable=["batch_stats"],
                debug_stop=debug_stop,
            )
            return out
        return params, apply

    params, apply = setup(9)
    for stop in (3, 4, 5):
        bench(f"s{stop}",
              jax.grad(lambda p, s=stop: apply(p, debug_stop=s)["digest"]),
              params)

    def fwd_obj(apply):
        def obj(p):
            out = apply(p)
            return sum(jnp.sum(o["box_corners"]) for o in out["aux_outputs"]) \
                + jnp.sum(out["outputs"]["box_corners"])
        return obj

    for n in (1, 5, 9):
        p_n, apply_n = setup(n)
        bench(f"d{n}", jax.grad(fwd_obj(apply_n)), p_n)

    s3, s4, s5 = results["s3"], results["s4"], results["s5"]
    d1, d5, d9 = results["d1"], results["d5"], results["d9"]
    print(f"\nFPS bwd {s4 - s3:.0f} | proj/pointcls/anchors {s5 - s4:.0f} | "
          f"layer0+topk+aux {d1 - s5:.0f} | per-decoder-layer "
          f"{(d9 - d1) / 8:.1f} (d5 slope {(d5 - d1) / 4:.1f})", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
