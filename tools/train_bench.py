"""Full-size train-step benchmark on the real chip (VERDICT round-1 #1).

Runs the published architecture (100k pts, 131k voxel capacity, ResNet34,
9-layer decoder, 1024 queries, repeat_num=5 matcher) through the real
Trainer train_step on synthetic scenes, measures steps/sec and checks the
loss is finite and decreasing over the measured window.

Usage: python tools/train_bench.py [steps] [jsonl_out]   (default 12)
Writes one JSON line to stdout (plus progress on stderr). With a second
argument, appends one JSON record per step to that path — the burn-in
artifact (VERDICT r2 item 4: demonstrate a decreasing smoothed loss over
>= 200 steps at the published size on chip).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(steps: int = 12, jsonl_out: str = None):
    import jax
    import jax.numpy as jnp

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
    from vdetr_tpu.data.synthetic import SyntheticDetectionDataset, collate
    from vdetr_tpu.models import build_model
    from vdetr_tpu.parallel import make_mesh
    from vdetr_tpu.train.engine import Trainer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    fps_impl = os.environ.get("BENCH_FPS_IMPL", "auto")
    if on_tpu:
        cfg = VDETRConfig(fps_impl=fps_impl)
    else:
        cfg = VDETRConfig(
            voxel_capacity=8192, min_stage_capacity=256,
            grid_extent=(512, 512, 256), preenc_npoints=512, nqueries=256,
            dec_nlayers=3, inplanes=16, fps_impl="jax", num_points=20000,
        )
        steps = min(steps, 3)
    ds = ScannetDatasetConfig()
    mesh = make_mesh(("data",), (1,), devices=jax.devices()[:1])
    model = build_model(cfg, ds, axis_name="data")
    # burn-in runs cycle a real epoch's worth of distinct scenes so a
    # decreasing loss means optimization, not 4-scene memorization
    nscenes = 32 if steps >= 100 else 4
    data = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                     num_scenes=max(nscenes, 16),
                                     max_objects=12)
    batches = []
    for i in range(nscenes):
        b = collate([data[i]])
        batches.append({k: jnp.asarray(v) for k, v in b.items()})

    trainer = Trainer(cfg, model, ds, mesh, steps_per_epoch=100)
    print("init...", file=sys.stderr, flush=True)
    t0 = time.time()
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    print(f"init {time.time()-t0:.1f}s; compiling train step...",
          file=sys.stderr, flush=True)
    t0 = time.time()
    rng = jax.random.PRNGKey(1)
    state, loss, _ = trainer.train_step(state, batches[0], rng, retries=0)
    first = float(loss)
    compile_s = time.time() - t0
    print(f"compile+step0 {compile_s:.1f}s loss={first:.3f}",
          file=sys.stderr, flush=True)

    losses = [first]
    jf = open(jsonl_out, "a") if jsonl_out else None
    if jf:
        jf.write(json.dumps({"event": "start", "steps": steps,
                             "scenes": len(batches),
                             "num_points": cfg.num_points,
                             "loss0": first}) + "\n")
    t0 = time.time()
    for it in range(steps):
        rng, srng = jax.random.split(rng)
        state, loss, _ = trainer.train_step(
            state, batches[it % len(batches)], srng, retries=0
        )
        losses.append(float(loss))  # sync each step: honest step time
        print(f"step {it}: loss={losses[-1]:.3f}", file=sys.stderr,
              flush=True)
        if jf:
            jf.write(json.dumps({"step": it, "loss": losses[-1],
                                 "t": round(time.time() - t0, 2)}) + "\n")
            jf.flush()
    dt = (time.time() - t0) / steps
    finite = all(np.isfinite(losses))
    decreasing = losses[-1] < losses[0]
    # smoothed (window-10, the reference's SmoothedValue window) decrease
    arr = np.asarray(losses)
    w = min(10, max(1, len(arr) // 4))
    sm_first = float(arr[:w].mean())
    sm_last = float(arr[-w:].mean())
    if jf:
        jf.write(json.dumps({"event": "end", "smoothed_first": sm_first,
                             "smoothed_last": sm_last,
                             "step_ms": round(dt * 1000, 2)}) + "\n")
        jf.close()

    print(json.dumps({
        "metric": "scannet_train_step_throughput",
        "value": round(1.0 / dt, 3),
        "unit": "scenes/sec/chip",
        "detail": {
            "backend": jax.default_backend(),
            "num_points": cfg.num_points,
            "step_ms": round(dt * 1000, 2),
            "compile_s": round(compile_s, 1),
            "loss_first": round(losses[0], 3),
            "loss_last": round(losses[-1], 3),
            "loss_finite": finite,
            "loss_decreasing": decreasing,
            "smoothed_first": round(sm_first, 3),
            "smoothed_last": round(sm_last, 3),
        },
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12,
         sys.argv[2] if len(sys.argv) > 2 else None)
