"""Learning-rate schedule: linear warmup then cosine (or 2-step decay).

Reference engine.py:24-56 — the LR is recomputed every iteration from the
normalized epoch position; here it's a pure function of the step index so
it can live inside the jitted update.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vdetr_tpu.config import VDETRConfig


def make_lr_schedule(cfg: VDETRConfig, steps_per_epoch: int):
    max_steps = max(cfg.max_epoch * steps_per_epoch, 1)
    warm_frac = cfg.warm_lr_epochs / cfg.max_epoch if cfg.max_epoch else 0.0

    if cfg.lr_scheduler == "cosine":
        def sched(step):
            cen = jnp.clip(step / max_steps, 0.0, 1.0)
            warm = cfg.warm_lr + cen * cfg.max_epoch * (
                (cfg.base_lr - cfg.warm_lr) / max(cfg.warm_lr_epochs, 1)
            )
            cos = cfg.final_lr + 0.5 * (cfg.base_lr - cfg.final_lr) * (
                1 + jnp.cos(jnp.pi * cen)
            )
            use_warm = (cen <= warm_frac) & (cfg.warm_lr_epochs > 0)
            return jnp.where(use_warm, warm, cos)
    else:
        step_1, step_2 = (int(x) for x in cfg.step_epoch.split("_"))

        def sched(step):
            cen = jnp.clip(step / max_steps, 0.0, 1.0)
            warm = cfg.warm_lr + cen * cfg.max_epoch * (
                (cfg.base_lr - cfg.warm_lr) / max(cfg.warm_lr_epochs, 1)
            )
            lr = jnp.where(
                cen < step_1 / cfg.max_epoch,
                cfg.base_lr,
                jnp.where(cen < step_2 / cfg.max_epoch, cfg.base_lr / 10,
                          cfg.base_lr / 100),
            )
            use_warm = (cen <= warm_frac) & (cfg.warm_lr_epochs > 0)
            return jnp.where(use_warm, warm, lr)

    return sched
