"""Train-step cost decomposition on the real chip.

Times four jitted programs on one realistic-density scene at the
published size and reports the deltas:

  fwd        model.apply(train=True)                      [forward]
  fwd+crit   forward + SetCriterion                       [+matcher/losses]
  grad       value_and_grad of (fwd+crit)                 [+backward]
  full       Trainer train_step                           [+pmean/AdamW]

so (fwd+crit − fwd) isolates the criterion+matcher, (grad − fwd+crit)
the backward pass, and (full − grad) the optimizer/collectives.

Usage: python tools/train_bisect.py [iters]
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
    from vdetr_tpu.parallel import make_mesh
    from vdetr_tpu.train.criterion import SetCriterion
    from vdetr_tpu.train.engine import Trainer, _model_inputs

    cfg = VDETRConfig()
    ds = ScannetDatasetConfig()
    model = build_model(cfg, ds)
    scenes = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                       num_scenes=1)
    batch = {k: jnp.asarray(v) for k, v in collate([scenes[0]]).items()}
    inputs = _model_inputs(batch)
    criterion = SetCriterion(cfg, ds)

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    variables = jax.jit(
        lambda r, i: model.init(r, i, train=False)
    )(rng, inputs)
    np.asarray(jax.tree.leaves(variables)[0].ravel()[0])
    print(f"init {time.time() - t0:.1f}s", flush=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fence(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    def bench(label, fn, *args):
        t0 = time.time()
        out = fn(*args)
        fence(out)
        first = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        fence(out)
        dt = (time.time() - t0) / iters * 1000
        print(f"[{label:9s}] first={first:.1f}s warm={dt:.1f}ms", flush=True)
        return dt

    drng = jax.random.PRNGKey(1)

    @jax.jit
    def fwd(params, stats, batch, drng):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats},
            _model_inputs(batch), train=True,
            rngs={"dropout": drng}, mutable=["batch_stats"],
        )
        # digest: touch every aux output so nothing dead-code-eliminates
        return sum(jnp.sum(o["box_corners"]) for o in out["aux_outputs"]) + \
            jnp.sum(out["outputs"]["box_corners"])

    @jax.jit
    def fwd_crit(params, stats, batch, drng):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats},
            _model_inputs(batch), train=True,
            rngs={"dropout": drng}, mutable=["batch_stats"],
        )
        loss, _ = criterion(out, batch)
        return loss

    @jax.jit
    def grad(params, stats, batch, drng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats},
                _model_inputs(batch), train=True,
                rngs={"dropout": drng}, mutable=["batch_stats"],
            )
            loss, _ = criterion(out, batch)
            return loss

        l, g = jax.value_and_grad(loss_fn)(params)
        return l + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)) * 0

    t_fwd = bench("fwd", fwd, params, stats, batch, drng)
    t_fc = bench("fwd+crit", fwd_crit, params, stats, batch, drng)
    t_g = bench("grad", grad, params, stats, batch, drng)

    mesh = make_mesh(("data",), (1,))
    trainer = Trainer(cfg, model, ds, mesh, steps_per_epoch=100)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    t0 = time.time()
    state, loss, _ = trainer.train_step(state, batch, drng, retries=0)
    fence(loss)
    first = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        state, loss, _ = trainer.train_step(state, batch, drng, retries=0)
    fence(loss)
    t_full = (time.time() - t0) / iters * 1000
    print(f"[full     ] first={first:.1f}s warm={t_full:.1f}ms", flush=True)

    print(f"\ndecomposition: fwd {t_fwd:.0f} | criterion "
          f"{t_fc - t_fwd:.0f} | backward {t_g - t_fc:.0f} | "
          f"optimizer/other {t_full - t_g:.0f}  (total {t_full:.0f} ms)",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
