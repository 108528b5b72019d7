"""Local end-to-end quality proof (VERDICT r4 item 1, top lever).

Overfits a FIXED synthetic scene set on the real chip at the published
architecture, then runs the complete eval pipeline — jitted forward,
device NMS, per-class expansion, VoteNet AP (eval/eval_det.py) — on those
same scenes. mAP@0.25 >= 0.90 on the training scenes proves the model,
matcher, criterion, NMS and AP protocol agree end-to-end; the same
harness runs on real ScanNet the day the data exists (swap the dataset).

Reference protocol being matched: /root/reference/engine.py:125-192
(evaluate) + /root/reference/utils/ap_calculator.py (parse_predictions /
APCalculator), scored exactly as results/scannet_result.txt.

Usage:
  python tools/quality_proof.py [--steps 3000] [--scenes 32] [--lr 5e-4]
      [--eval_every 500] [--batch 1] [--out QUALITY_r05.json] [--tiny]

--tiny runs a reduced config for harness validation on CPU.
Writes one JSON artifact with the mAP trajectory + per-class table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--scenes", type=int, default=32)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--warmup_steps", type=int, default=200)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--max_objects", type=int, default=10)
    p.add_argument("--out", type=str, default="QUALITY_r05.json")
    p.add_argument("--jsonl", type=str, default="")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse()
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
    from vdetr_tpu.eval.ap_calculator import (APCalculator,
                                              config_dict_from_cfg)
    from vdetr_tpu.models import build_model
    from vdetr_tpu.parallel import make_mesh
    from vdetr_tpu.train.engine import Trainer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    steps = args.steps
    spe = max(args.scenes // args.batch, 1)  # steps per epoch
    max_epoch = max((steps + spe - 1) // spe, 1)
    warm_epochs = max(round(args.warmup_steps / spe), 1)
    common = dict(
        base_lr=args.lr, warm_lr_epochs=warm_epochs, max_epoch=max_epoch,
        final_lr=args.lr / 20, batchsize_per_gpu=args.batch,
    )
    if on_tpu and not args.tiny:
        cfg = VDETRConfig(**common)
    else:
        cfg = VDETRConfig(
            voxel_capacity=8192, min_stage_capacity=256,
            grid_extent=(512, 512, 256), preenc_npoints=512, nqueries=256,
            dec_nlayers=3, inplanes=16, fps_impl="jax", num_points=20000,
            **common,
        )
    ds = ScannetDatasetConfig()
    mesh = make_mesh(("data",), (1,), devices=jax.devices()[:1])
    model = build_model(cfg, ds, axis_name="data")
    data = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                     num_scenes=args.scenes,
                                     max_objects=args.max_objects,
                                     seed=args.seed)
    batches = []
    for i in range(0, args.scenes, args.batch):
        b = collate([data[(i + j) % args.scenes]
                     for j in range(args.batch)])
        batches.append({k: jnp.asarray(v) for k, v in b.items()})

    trainer = Trainer(cfg, model, ds, mesh, steps_per_epoch=spe)
    print("init...", file=sys.stderr, flush=True)
    t0 = time.time()
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batches[0])
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    ap_cfg = config_dict_from_cfg(cfg, ds)

    def eval_pass(state):
        calc = APCalculator(ds, ap_iou_thresh=[0.25, 0.5],
                            class2type_map=ds.class2type,
                            ap_config_dict=ap_cfg,
                            axis_align_test=cfg.axis_align_test)
        for b in batches:
            out = trainer.eval_step(state, b, retries=0)
            calc.step(out, b)
        overall = calc.compute_metrics()
        return calc, overall

    jsonl = open(args.jsonl, "a") if args.jsonl else None
    trajectory = []
    best = {"mAP25": -1.0}
    rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    losses = []
    for step in range(1, steps + 1):
        rng, srng = jax.random.split(rng)
        b = batches[(step - 1) % len(batches)]
        state, loss, _ = trainer.train_step(state, b, srng, retries=0)
        if step == 1:
            print(f"train compile {time.time()-t0:.1f}s "
                  f"loss {float(loss):.2f}", file=sys.stderr, flush=True)
        losses.append(float(loss))
        if jsonl and step % 10 == 0:
            jsonl.write(json.dumps(
                {"step": step,
                 "loss": float(np.mean(losses[-10:]))}) + "\n")
            jsonl.flush()
        if step % args.eval_every == 0 or step == steps:
            te = time.time()
            calc, overall = eval_pass(state)
            m25 = float(overall[0.25]["mAP"]) * 100
            m50 = float(overall[0.5]["mAP"]) * 100
            rec = {"step": step, "loss": float(np.mean(losses[-50:])),
                   "mAP25": m25, "mAP50": m50,
                   "AR25": float(overall[0.25]["AR"]) * 100,
                   "AR50": float(overall[0.5]["AR"]) * 100}
            trajectory.append(rec)
            print(f"step {step}: loss {rec['loss']:.2f} "
                  f"mAP@0.25 {m25:.2f} mAP@0.50 {m50:.2f} "
                  f"(eval {time.time()-te:.0f}s)",
                  file=sys.stderr, flush=True)
            if m25 > best["mAP25"]:
                best = {"mAP25": m25, "mAP50": m50, "step": step,
                        "per_class25": {
                            k: float(v) * 100 for k, v in
                            overall[0.25].items()
                            if isinstance(v, float) and k not in
                            ("mAP", "AR")},
                        "report": calc.metrics_to_str(overall)}
    wall = time.time() - t0

    out = {
        "what": ("synthetic-overfit end-to-end quality proof: train on a "
                 "fixed set, evaluate the SAME scenes through the full "
                 "jitted eval + device NMS + per-class expansion + "
                 "VoteNet AP pipeline"),
        "backend": jax.default_backend(),
        "config": {"steps": steps, "scenes": args.scenes, "lr": args.lr,
                   "batch": args.batch, "num_points": cfg.num_points,
                   "nqueries": cfg.nqueries, "dec_nlayers": cfg.dec_nlayers,
                   "depth": cfg.depth, "tiny": bool(args.tiny or not on_tpu)},
        "mAP25": best["mAP25"], "mAP50": best["mAP50"],
        "best_step": best.get("step"),
        "trajectory": trajectory,
        "loss_first": losses[0], "loss_final": float(np.mean(losses[-50:])),
        "wall_s": round(wall, 1),
        "report_at_best": best.get("report", ""),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("mAP25", "mAP50", "best_step", "loss_final")}))
    if jsonl:
        jsonl.close()


if __name__ == "__main__":
    main()
