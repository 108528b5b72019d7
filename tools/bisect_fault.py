"""Bisect the full-size train-step worker fault: run isolated stages.

Stages:
  fwd        model forward only (train=True), no grad
  grad_model grad of a scalar pooled from model outputs (no criterion)
  crit       forward + criterion, no grad
  grad_crit  full loss grad (= train step minus optimizer)
Usage: python tools/bisect_fault.py <stage>
"""

import os
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main(stage: str):
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

    cfg = VDETRConfig(fps_impl=os.environ.get("BENCH_FPS_IMPL", "auto"))
    ds = ScannetDatasetConfig()
    model = build_model(cfg, ds)
    data = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                     num_scenes=4, max_objects=12)
    b = collate([data[0]])
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    criterion = build_criterion(cfg, ds)

    t0 = time.time()
    variables = jax.jit(
        lambda r, inp: model.init(r, inp, train=False)
    )(jax.random.PRNGKey(0), _model_inputs(batch))
    jax.block_until_ready(variables)
    print(f"init {time.time()-t0:.1f}s", flush=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(1)

    def fwd_loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": stats},
            _model_inputs(batch), train=True, rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        return out

    def pooled(params):
        out = fwd_loss(params)
        leaves = jax.tree.leaves(
            {"o": out["outputs"], "a": out["aux_outputs"]}
        )
        return sum(jnp.sum(x * x) for x in leaves if x.dtype == jnp.float32)

    def crit_loss(params):
        out = fwd_loss(params)
        loss, _ = criterion(out, batch)
        return loss

    if stage in ("step", "smap"):
        from vdetr_tpu.parallel import make_mesh
        from vdetr_tpu.train.engine import Trainer

        mesh = make_mesh(("data",), (1,), devices=jax.devices()[:1])
        model2 = build_model(cfg, ds, axis_name="data")
        trainer = Trainer(cfg, model2, ds, mesh, steps_per_epoch=100)
        if stage == "step":
            # grad + optimizer update, no shard_map
            import jax.numpy as jnp2

            def full(params, opt_state):
                def loss_fn(p):
                    out, _ = model.apply(
                        {"params": p, "batch_stats": stats},
                        _model_inputs(batch), train=True,
                        rngs={"dropout": rng}, mutable=["batch_stats"],
                    )
                    return criterion(out, batch)[0]

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = trainer.tx.update(grads, opt_state,
                                                       params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return params, opt_state, loss

            opt_state = trainer.tx.init(params)
            fn = jax.jit(full)
            for i in range(3):
                t0 = time.time()
                params, opt_state, loss = fn(params, opt_state)
                jax.block_until_ready(loss)
                print(f"step {i}: {time.time()-t0:.2f}s "
                      f"loss={float(loss):.3f}", flush=True)
        else:
            state = trainer.init_state(jax.random.PRNGKey(0), batch)
            for i in range(3):
                t0 = time.time()
                state, loss, _ = trainer.train_step(
                    state, batch, jax.random.fold_in(rng, i), retries=0
                )
                print(f"smap step {i}: {time.time()-t0:.2f}s "
                      f"loss={float(loss):.3f}", flush=True)
        print("OK", flush=True)
        return

    fns = {
        "fwd": jax.jit(pooled),
        "grad_model": jax.jit(jax.grad(pooled)),
        "crit": jax.jit(crit_loss),
        "grad_crit": jax.jit(jax.grad(crit_loss)),
    }
    fn = fns[stage]
    for i in range(3):
        t0 = time.time()
        out = fn(params)
        jax.block_until_ready(out)
        print(f"{stage} step {i}: {time.time()-t0:.2f}s", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
