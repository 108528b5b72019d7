"""Backward-pass cost bisection on the real chip.

Times value_and_grad of three nested objectives at the published size:

  bb     sum of backbone+FPN features (stops at debug_stop=3)
  fwd    digest of the full forward (all aux box corners)
  loss   forward + SetCriterion

so (bb) isolates the backbone backward, (fwd − bb) the decoder backward,
and (loss − fwd) the criterion backward + matcher.

Usage: python tools/grad_bisect.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(iters: int = 8):
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
    from vdetr_tpu.train.criterion import SetCriterion
    from vdetr_tpu.train.engine import _model_inputs

    cfg = VDETRConfig()
    ds = ScannetDatasetConfig()
    model = build_model(cfg, ds)
    scenes = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                       num_scenes=1)
    batch = {k: jnp.asarray(v) for k, v in collate([scenes[0]]).items()}
    inputs = _model_inputs(batch)
    criterion = SetCriterion(cfg, ds)

    t0 = time.time()
    variables = jax.jit(
        lambda r, i: model.init(r, i, train=False)
    )(jax.random.PRNGKey(0), inputs)
    np.asarray(jax.tree.leaves(variables)[0].ravel()[0])
    print(f"init {time.time() - t0:.1f}s", flush=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    drng = jax.random.PRNGKey(1)

    def fence(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    def bench(label, fn):
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
        print(f"[{label:5s}] first={first:.1f}s warm={dt:.1f}ms", flush=True)
        return dt

    def apply(p, debug_stop=0):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, inputs, train=True,
            rngs={"dropout": drng}, mutable=["batch_stats"],
            debug_stop=debug_stop,
        )
        return out

    def bb_obj(p):
        return apply(p, debug_stop=3)["digest"]

    def fwd_obj(p):
        out = apply(p)
        return sum(jnp.sum(o["box_corners"]) for o in out["aux_outputs"]) \
            + jnp.sum(out["outputs"]["box_corners"])

    def loss_obj(p):
        out = apply(p)
        loss, _ = criterion(out, batch)
        return loss

    t_bb = bench("bb", jax.grad(bb_obj))
    t_fwd = bench("fwd", jax.grad(fwd_obj))
    t_loss = bench("loss", jax.grad(loss_obj))
    print(f"\nbackward decomposition: backbone(fwd+bwd) {t_bb:.0f} | "
          f"decoder(fwd+bwd) {t_fwd - t_bb:.0f} | criterion(fwd+bwd) "
          f"{t_loss - t_fwd:.0f}  (total {t_loss:.0f} ms)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
