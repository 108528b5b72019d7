"""CLI: training / evaluation orchestration (reference main.py).

The flag surface mirrors the reference (~90 flags, main.py:30-216) and is
parsed straight into `VDETRConfig`. One process drives the whole device
mesh — there is no per-GPU process spawn (reference main.py:588-593); the
reference's `--ngpus` maps to the mesh size.

Usage:
  python -m vdetr_tpu.main --dataset_name synthetic --max_epoch 2
  python -m vdetr_tpu.main --dataset_name scannet \
      --dataset_root_dir scannet_data/ --checkpoint_dir ckpt/
  python -m vdetr_tpu.main --dataset_name scannet --test_only --auto_test \
      --test_ckpt ckpt/checkpoint_best ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pickle
import sys
import time
from typing import Optional

import numpy as np

from vdetr_tpu.config import VDETRConfig


def make_args_parser() -> argparse.ArgumentParser:
    """Every VDETRConfig field becomes a flag (bools as 0/1 for
    overridability, unlike the reference's store_true-with-True-default
    flags which cannot be disabled)."""
    parser = argparse.ArgumentParser(
        "TPU-native 3D detection (V-DETR capabilities)", add_help=True
    )
    defaults = VDETRConfig()
    for f in dataclasses.fields(VDETRConfig):
        name = f"--{f.name}"
        default = getattr(defaults, f.name)
        if f.name in ("grid_extent", "mesh_shape", "mesh_axis_names"):
            continue  # advanced: settable in code
        if isinstance(default, bool):
            parser.add_argument(name, type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=default)
        elif isinstance(default, int):
            parser.add_argument(name, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)
    return parser


def config_from_args(args) -> VDETRConfig:
    kw = {f.name: getattr(args, f.name)
          for f in dataclasses.fields(VDETRConfig) if hasattr(args, f.name)}
    return VDETRConfig(**kw)


def build_datasets(cfg: VDETRConfig):
    from vdetr_tpu.data import get_dataset_config

    ds_cfg = get_dataset_config(cfg.dataset_name)
    if cfg.dataset_name == "synthetic":
        from vdetr_tpu.data.synthetic import SyntheticDetectionDataset

        train = SyntheticDetectionDataset(ds_cfg, cfg.num_points,
                                          num_scenes=64, seed=cfg.seed)
        val = SyntheticDetectionDataset(ds_cfg, cfg.num_points,
                                        num_scenes=16, seed=cfg.seed + 1)
    elif cfg.dataset_name == "scannet":
        from vdetr_tpu.data.scannet import ScannetDetectionDataset

        train = ScannetDetectionDataset(cfg, ds_cfg, "train")
        val = ScannetDetectionDataset(cfg, ds_cfg, "val")
    elif cfg.dataset_name == "sunrgbd":
        from vdetr_tpu.data.sunrgbd import SunrgbdDetectionDataset

        train = SunrgbdDetectionDataset(cfg, ds_cfg, "train")
        val = SunrgbdDetectionDataset(cfg, ds_cfg, "val")
    else:
        raise ValueError(cfg.dataset_name)
    return {"train": train, "test": val}, ds_cfg


def main(argv: Optional[list] = None):
    import jax

    args = make_args_parser().parse_args(argv)
    cfg = config_from_args(args)

    torch_ckpt = None
    if cfg.test_only and cfg.test_ckpt and cfg.test_ckpt.endswith(".pth"):
        # reference-format torch checkpoint (scannet_540ep.pth layout):
        # weights import through the shim; --auto_test restores model
        # hyperparams from the pickled args (reference main.py:218-233)
        import torch

        from vdetr_tpu.config import AUTO_TEST_IGNORE_KEYS
        from vdetr_tpu.train.torch_import import reference_args_to_config

        torch_ckpt = torch.load(cfg.test_ckpt, map_location="cpu",
                                weights_only=False)
        if cfg.auto_test and "args" in torch_ckpt:
            cfg = reference_args_to_config(torch_ckpt["args"], cfg,
                                           AUTO_TEST_IGNORE_KEYS)
    elif cfg.test_only and cfg.auto_test and cfg.test_ckpt:
        from vdetr_tpu.train.checkpoint import auto_reload_config

        cfg = auto_reload_config(cfg, cfg.test_ckpt)

    np.random.seed(cfg.seed)

    from vdetr_tpu.data.loader import prefetch_loader
    from vdetr_tpu.models import build_model
    from vdetr_tpu.parallel import make_mesh
    from vdetr_tpu.train.engine import Trainer, train_one_epoch, evaluate
    from vdetr_tpu.train import checkpoint as ckpt_io
    from vdetr_tpu.eval.ap_calculator import APCalculator, config_dict_from_cfg

    datasets, ds_cfg = build_datasets(cfg)
    mesh = make_mesh(cfg.mesh_axis_names, cfg.mesh_shape)
    ndev = int(mesh.devices.size)
    global_batch = cfg.batchsize_per_gpu * ndev
    steps_per_epoch = max(len(datasets["train"]) // global_batch, 1)

    # sync-BN statistics span every mesh axis (voxels are sharded across
    # "seq" too when the large-scene config is active)
    bn_axes = (cfg.mesh_axis_names if len(cfg.mesh_axis_names) > 1
               else cfg.mesh_axis_names[0])
    model = build_model(cfg, ds_cfg,
                        axis_name=bn_axes if cfg.mink_syncbn else None)
    trainer = Trainer(cfg, model, ds_cfg, mesh, steps_per_epoch)

    import jax.numpy as jnp
    from vdetr_tpu.data.synthetic import collate

    n_train = len(datasets["train"])
    sample = collate([datasets["train"][i % n_train]
                      for i in range(global_batch)])
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), sample)

    def eval_pass(state, tag=""):
        calc = APCalculator(
            ds_cfg, ap_iou_thresh=[0.25, 0.5],
            class2type_map=ds_cfg.class2type,
            ap_config_dict=config_dict_from_cfg(cfg, ds_cfg),
            axis_align_test=cfg.axis_align_test,
        )
        # pad_last: every val scan is scored (the reference evaluates all
        # scans at bs=1, engine.py:125-192; dropping the tail biases mAP)
        loader = prefetch_loader(datasets["test"], global_batch,
                                 shuffle=False, pad_last=True,
                                 num_workers=cfg.dataset_num_workers)
        to_device = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
        for batch in loader:
            batch = to_device(batch)
            if cfg.tta:
                from vdetr_tpu.eval.tta import tta_eval_step

                out = tta_eval_step(trainer.eval_step, state, batch,
                                    to_device=to_device)
            else:
                out = trainer.eval_step(state, batch)
            calc.step(out, batch)
        overall = calc.compute_metrics()
        print(calc.metrics_to_str(overall))
        return calc, overall

    if cfg.test_only:
        if torch_ckpt is not None:
            from vdetr_tpu.train.torch_import import convert_torch_state_dict

            sd = torch_ckpt["model"] if "model" in torch_ckpt else torch_ckpt
            params, stats, report = convert_torch_state_dict(sd, cfg)
            if report["missing"]:
                raise ValueError(
                    f"torch checkpoint missing {len(report['missing'])} "
                    f"tensors, e.g. {report['missing'][:5]}"
                )
            if report["unused"]:
                print(f"warning: {len(report['unused'])} unused ckpt "
                      f"tensors, e.g. {report['unused'][:5]}")
            state = state.replace(
                params=jax.tree.map(jnp.asarray, params),
                batch_stats=jax.tree.map(jnp.asarray, stats),
            )
            print(f"imported torch checkpoint at epoch "
                  f"{torch_ckpt.get('epoch')}")
        elif cfg.test_ckpt:
            state, header = ckpt_io.load_checkpoint(cfg.test_ckpt, state)
            print(f"loaded checkpoint at epoch {header.get('epoch')}")
        calc, overall = eval_pass(state)
        if cfg.test_size:
            for size in ("S", "M", "L"):
                print(f"==== size bucket {size} ====")
                print(calc.metrics_to_str(calc.compute_metrics(size=size)))
        return overall

    # ---- training (reference do_train, main.py:237-434) ----
    start_epoch = 0
    best = {}
    if cfg.checkpoint_dir:
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        state, last_epoch, best = ckpt_io.resume_if_possible(
            cfg.checkpoint_dir, state
        )
        start_epoch = last_epoch + 1
    from vdetr_tpu.utils.logging import MetricsLogger

    mlogger = MetricsLogger(cfg.checkpoint_dir, run_name="train")
    wandb = None
    if cfg.wandb_activate:
        try:  # optional; this environment is zero-egress
            import wandb as _wandb

            if cfg.wandb_key:  # reference main.py:560
                _wandb.login(key=cfg.wandb_key)
            run_name = os.path.basename(cfg.checkpoint_dir or "run")
            _wandb.init(project=cfg.wandb_project, entity=cfg.wandb_entity,
                        name=run_name, id=run_name)
            wandb = _wandb
        except Exception as e:
            print(f"wandb unavailable ({e}); logging to JSONL only")
    rng = jax.random.PRNGKey(cfg.seed)
    for epoch in range(start_epoch, cfg.max_epoch):
        rng, erng = jax.random.split(rng)
        loader = (
            {k: jnp.asarray(v) for k, v in b.items()}
            for b in prefetch_loader(datasets["train"], global_batch,
                                     shuffle=True, seed=cfg.seed + epoch,
                                     num_workers=cfg.dataset_num_workers)
        )
        state, mean_loss, loss_dict = train_one_epoch(
            trainer, state, loader, erng, epoch, log_every=cfg.log_every,
            profile_dir=cfg.profile_dir, metrics_logger=mlogger,
            log_metrics_every=cfg.log_metrics_every,
        )
        if cfg.checkpoint_dir:
            ckpt_io.save_checkpoint(cfg.checkpoint_dir, state, cfg, epoch,
                                    best)
            # numbered snapshots in the last tenth of training
            # (reference main.py:319-332)
            if (cfg.save_separate_checkpoint_every_epoch > 0
                    and epoch >= cfg.max_epoch * 0.9
                    and epoch % cfg.save_separate_checkpoint_every_epoch == 0):
                ckpt_io.save_checkpoint(cfg.checkpoint_dir, state, cfg,
                                        epoch, best,
                                        filename=f"checkpoint_{epoch:04d}")
        mlogger.log({"loss": mean_loss, **(loss_dict or {})}, epoch,
                    prefix="train/")
        if wandb is not None:
            wandb.log({"train/loss": float(mean_loss)}, step=epoch)
        is_eval_epoch = (
            epoch % cfg.eval_every_epoch == 0
            or epoch == cfg.max_epoch - 1
            or epoch == 10
        )
        if is_eval_epoch:
            _, overall = eval_pass(state)
            val_metrics = (
                {f"mAP_{t}": overall[t]["mAP"] for t in overall}
                | {f"AR_{t}": overall[t]["AR"] for t in overall}
            )
            mlogger.log(val_metrics, epoch, prefix="val/")
            if wandb is not None:  # reference main.py:362-383 logs val too
                wandb.log({f"val/{k}": float(v)
                           for k, v in val_metrics.items()}, step=epoch)
            cur = overall[0.25]["mAP"]
            if cur > best.get("mAP_0.25", -1):
                best = {"mAP_0.25": float(cur),
                        "mAP_0.5": float(overall[0.5]["mAP"]),
                        "epoch": epoch}
                if cfg.checkpoint_dir:
                    ckpt_io.save_checkpoint(cfg.checkpoint_dir, state, cfg,
                                            epoch, best,
                                            filename=ckpt_io.BEST)
            print(f"epoch {epoch}: loss {mean_loss:.3f} "
                  f"mAP@0.25 {cur * 100:.2f} (best {best})")

    # final artifacts (reference main.py:260-261, 422-434)
    calc, overall = eval_pass(state)
    if cfg.checkpoint_dir:
        with open(os.path.join(cfg.checkpoint_dir, "final_eval.txt"),
                  "w") as f:
            f.write(calc.metrics_to_str(overall))
        with open(os.path.join(cfg.checkpoint_dir, "final_eval.pkl"),
                  "wb") as f:
            pickle.dump({float(k): dict(v) for k, v in overall.items()}, f)
    return overall


def cli():
    main()


if __name__ == "__main__":
    cli()
