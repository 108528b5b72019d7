"""AOT-compile the full-size train step and print XLA memory analysis
(no execution): distinguishes HBM OOM from genuine runtime faults when
the remote worker crashes at execution time."""

import os
import sys

import numpy as np


def main(mode="train"):
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
    from vdetr_tpu.train.engine import Trainer

    cfg = VDETRConfig()
    ds = ScannetDatasetConfig()
    mesh = make_mesh(("data",), (1,), devices=jax.devices()[:1])
    model = build_model(cfg, ds, axis_name="data")
    data = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                     num_scenes=4, max_objects=12)
    b = collate([data[0]])
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    trainer = Trainer(cfg, model, ds, mesh, steps_per_epoch=100)

    print("eval_shape init...", flush=True)
    state_shape = jax.eval_shape(
        lambda: trainer.init_state(jax.random.PRNGKey(0), batch)
    )
    nparams = sum(
        int(np.prod(x.shape))
        for x in jax.tree.leaves(state_shape.params)
    )
    print(f"params: {nparams/1e6:.2f} M", flush=True)

    rng = jax.random.PRNGKey(1)
    print("lower+compile train step...", flush=True)
    lowered = trainer._train_step.lower(state_shape, batch, rng)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(ma, flush=True)
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes"):
        v = getattr(ma, attr, None)
        if v is not None:
            print(f"{attr}: {v/2**30:.3f} GiB", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
