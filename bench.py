"""Benchmark on the published ScanNet configuration (100k-point scenes,
4096 seeds, 1024 queries, ResNet34 backbone, 9-layer decoder), synthetic
input.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/sec/chip", "vs_baseline": N,
   "detail": {...}}

Primary metric: eval-forward throughput. detail carries the sub-benches:
  train_step_ms / train_scenes_per_sec  — full train step (fwd + criterion
      + auction matcher + backward + AdamW) at the published architecture
  kernel_smoke — compiled-Mosaic kernel parity gate (tools/tpu_smoke.py)
Sub-benches degrade gracefully: a failing section reports its error
string instead of killing the primary metric.

vs_baseline: the reference publishes no throughput (SURVEY.md §6); the
BASELINE.json target is ">= 5x A100 scenes/sec/chip". The A100 figure is
an ASSUMPTION (no A100 here to measure): ~10 scenes/sec for a
MinkowskiEngine+DETR pipeline at 100k points. vs_baseline =
value / (5 * 10); the assumption is recorded in detail.baseline_assumption
so the number cannot be mistaken for a measured ratio.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

ASSUMED_A100_SCENES_PER_SEC = 10.0
TARGET_MULTIPLIER = 5.0


def _sync(out):
    """Force a device->host transfer of one leaf. On the axon
    remote-attached backend `jax.block_until_ready` returns before the
    device has executed (measured: a 14 ms kernel 'completes' in 0.04 ms
    under block_until_ready, 42 ms with a forced transfer); a host copy
    is the only reliable fence. The single device executes the queue in
    order, so transferring from the LAST output drains everything."""
    import jax

    return np.asarray(jax.tree.leaves(out)[0].ravel()[0])


def _bench(fn, inputs_list, iters):
    """Warmup + mean over iters, distinct inputs per iteration (the
    remote runtime dedups identical executions), host-transfer fence."""
    out = fn(*inputs_list[0])
    _sync(out)
    t0 = time.time()
    for it in range(iters):
        out = fn(*inputs_list[it % len(inputs_list)])
    _sync(out)
    return (time.time() - t0) / iters


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
        iters = 20
        train_iters = 10
    else:  # CPU smoke mode
        cfg = VDETRConfig(
            voxel_capacity=8192, min_stage_capacity=256,
            grid_extent=(512, 512, 256), preenc_npoints=512, nqueries=256,
            dec_nlayers=3, inplanes=16, fps_impl="jax", num_points=20000,
        )
        iters = 3
        train_iters = 2
    N = cfg.num_points
    batch = 1
    detail = {"backend": jax.default_backend(), "num_points": N,
              "batch": batch,
              "baseline_assumption": (
                  f"A100 reference eval assumed "
                  f"{ASSUMED_A100_SCENES_PER_SEC} scenes/sec (not "
                  f"measured); target {TARGET_MULTIPLIER}x")}

    rng = np.random.RandomState(0)
    ds = ScannetDatasetConfig()

    def make_inputs(b=1):
        pts = rng.rand(b, N, 3).astype(np.float32) * np.array(
            [6.0, 5.0, 2.8], np.float32
        )
        return {
            "point_clouds": jnp.asarray(pts),
            "point_cloud_dims_min": jnp.asarray(pts.min(1)),
            "point_cloud_dims_max": jnp.asarray(pts.max(1)),
        }

    inputs = make_inputs()
    model = build_model(cfg, ds)
    t0 = time.time()
    variables = jax.jit(
        lambda r, i: model.init(r, i, train=False)
    )(jax.random.PRNGKey(0), inputs)
    _sync(variables)
    detail["init_s"] = round(time.time() - t0, 1)

    # ---- primary: eval forward (best over batch sizes; the metric is
    # scenes/sec/chip, and batching amortizes per-dispatch overheads) ----
    fwd = jax.jit(lambda v, i: model.apply(v, i, train=False))
    t0 = time.time()
    _sync(fwd(variables, inputs))
    detail["compile_s"] = round(time.time() - t0, 1)
    scenes_per_sec = 0.0
    detail["eval_by_batch"] = {}
    for b, b_iters in ([(1, iters), (4, max(iters // 3, 2)),
                        (8, max(iters // 4, 2))] if on_tpu
                       else [(1, iters)]):
        try:
            input_sets = [(variables, make_inputs(b))
                          for _ in range(min(b_iters, 8))]
            dt = _bench(fwd, input_sets, b_iters)
            sps = b / dt
            detail["eval_by_batch"][str(b)] = {
                "step_ms": round(dt * 1000, 2),
                "scenes_per_sec": round(sps, 3)}
            if b == 1:
                detail["step_ms"] = round(dt * 1000, 2)
            if sps > scenes_per_sec:
                scenes_per_sec = sps
                batch = b
        except Exception as e:  # noqa: BLE001 - report, keep going
            detail["eval_by_batch"][str(b)] = (
                f"{type(e).__name__}: {str(e).splitlines()[0][:160]}")
            traceback.print_exc(file=sys.stderr)
    detail["batch"] = batch

    # ---- analytic useful FLOPs -> achieved TFLOP/s + MFU lower bound ----
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.flops import analytic_eval_flops

        fl = analytic_eval_flops(cfg, inputs)
        tflops = fl["total_gflop"] / 1e3 * scenes_per_sec
        detail["model_gflop_per_scene"] = fl["total_gflop"]
        detail["flop_breakdown_gflop"] = fl["breakdown"]
        detail["achieved_tflops"] = round(tflops, 2)
        # v5e bf16 MXU peak 197 TFLOP/s; useful-FLOP MFU is a LOWER
        # bound (the keyed convs + matmul-form RPE deliberately execute
        # extra MXU work for memory locality; see tools/flops.py)
        detail["mfu_useful_lower_bound"] = round(tflops / 197.0, 4)
    except Exception as e:  # noqa: BLE001
        detail["flops_error"] = (
            f"{type(e).__name__}: {str(e).splitlines()[0][:160]}")

    # ---- train step (VERDICT round-1 item 1: a train metric in BENCH) ----
    try:
        from vdetr_tpu.data.synthetic import SyntheticDetectionDataset, collate
        from vdetr_tpu.parallel import make_mesh
        from vdetr_tpu.train.engine import Trainer

        mesh = make_mesh(("data",), (1,), devices=jax.devices()[:1])
        tmodel = build_model(cfg, ds, axis_name="data")
        # rotate DISTINCT scenes through the timed loop: auction-matcher
        # iteration count depends on proposal ties, so feeding one scene
        # repeatedly can misstate the steady-state step cost
        data = SyntheticDetectionDataset(ds, num_points=N, num_scenes=8,
                                         max_objects=12)
        tbatches = [{k: jnp.asarray(v) for k, v in collate([data[i]]).items()}
                    for i in range(4)]
        tbatch = tbatches[0]
        trainer = Trainer(cfg, tmodel, ds, mesh, steps_per_epoch=1000)
        state = trainer.init_state(jax.random.PRNGKey(0), tbatch)
        rngk = jax.random.PRNGKey(1)
        t0 = time.time()
        state, loss, _ = trainer.train_step(state, tbatch, rngk, retries=0)
        loss0 = float(loss)  # host transfer = the only real fence on axon
        detail["train_compile_s"] = round(time.time() - t0, 1)
        # warmup steps before timing: at INIT weights the decoder emits
        # near-identical proposals, the matcher's pathological all-tied
        # case — its while-loop iteration count (and so the step time)
        # drops several-fold once the proposals differentiate (measured
        # 1725 ms over the first post-compile steps vs 849 ms averaged
        # over 16 steps). Timing from a few steps in reports the
        # steady-state cost, matching tools/train_bench.py.
        for i in range(3):
            state, loss, _ = trainer.train_step(
                state, tbatches[i % len(tbatches)],
                jax.random.fold_in(rngk, 1000 + i), retries=0)
        float(loss)
        t0 = time.time()
        for i in range(train_iters):
            state, loss, _ = trainer.train_step(
                state, tbatches[i % len(tbatches)],
                jax.random.fold_in(rngk, i), retries=0
            )
        loss_final = float(loss)  # drains the serialized step queue
        tdt = (time.time() - t0) / train_iters
        # train runs batch 1 here — do NOT divide by the best EVAL batch
        detail["train_step_ms"] = round(tdt * 1000, 2)
        detail["train_by_batch"] = {
            "1": {"step_ms": round(tdt * 1000, 2),
                  "scenes_per_sec": round(1.0 / tdt, 3)}}
        train_sps = 1.0 / tdt
        detail["train_loss_first"] = round(loss0, 3)
        detail["train_loss_final"] = round(loss_final, 3)
        if on_tpu:
            try:
                tb4 = [{k: jnp.asarray(v) for k, v in
                        collate([data[4 + j] for j in range(4)]).items()}]
                it4 = max(train_iters // 3, 2)
                state4 = state  # params/opt state are batch-independent
                for i in range(3):
                    state4, loss, _ = trainer.train_step(
                        state4, tb4[0], jax.random.fold_in(rngk, 2000 + i),
                        retries=0)
                float(loss)
                t0 = time.time()
                for i in range(it4):
                    state4, loss, _ = trainer.train_step(
                        state4, tb4[0], jax.random.fold_in(rngk, 3000 + i),
                        retries=0)
                float(loss)
                dt4 = (time.time() - t0) / it4
                detail["train_by_batch"]["4"] = {
                    "step_ms": round(dt4 * 1000, 2),
                    "scenes_per_sec": round(4.0 / dt4, 3)}
                train_sps = max(train_sps, 4.0 / dt4)
            except Exception as e:  # noqa: BLE001
                detail["train_by_batch"]["4"] = (
                    f"{type(e).__name__}: {str(e).splitlines()[0][:160]}")
        detail["train_scenes_per_sec"] = round(train_sps, 3)
    except Exception as e:  # noqa: BLE001 - report, keep primary metric
        detail["train_step_error"] = (
            f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
        )
        traceback.print_exc(file=sys.stderr)

    # ---- on-chip kernel smoke gate (compiled Mosaic, not interpret) ----
    # Note: a separate bf16 eval sub-bench was removed in round 3 — the
    # TPU default matmul precision already runs bf16-input MXU dots, so
    # explicit round-trip casts compile to the identical program
    # (verified bit-identical; ROUND3_NOTES.md).
    if on_tpu:
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from tools.tpu_smoke import run_checks

            detail["kernel_smoke"] = run_checks()
        except Exception as e:  # noqa: BLE001
            detail["kernel_smoke"] = (
                f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
            )

    print(json.dumps({
        "metric": "scannet_eval_forward_throughput",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(
            scenes_per_sec / (TARGET_MULTIPLIER * ASSUMED_A100_SCENES_PER_SEC),
            3,
        ),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
