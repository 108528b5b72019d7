"""Optimizer: AdamW with optional bias / 1-d parameter weight-decay
exclusion and global-norm gradient clipping.

Reference optimizer.py:4-26 (`filter_biases_wd`) + engine.py:105-107
(clip_grad_norm_ 0.1 before the step).
"""

from __future__ import annotations

import jax
import optax

from vdetr_tpu.config import VDETRConfig


def wd_mask(params):
    """True where weight decay applies: ndim > 1 (reference excludes biases
    and 1-d params when filter_biases_wd is set)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def build_optimizer(cfg: VDETRConfig, lr_schedule, params=None):
    mask = None
    if cfg.filter_biases_wd:
        mask = wd_mask
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_gradient)
        if cfg.clip_gradient > 0 else optax.identity(),
        optax.adamw(
            learning_rate=lr_schedule,
            weight_decay=cfg.weight_decay,
            mask=mask,
        ),
    )
    return tx
