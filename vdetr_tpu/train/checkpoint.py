"""Checkpoint save / resume.

Reference utils/io.py: `checkpoint.pth` every epoch, numbered snapshots,
best-by-metric, auto-resume, with the config pickled inside. Here a
checkpoint is a directory containing a msgpack-serialized train state
(flax.serialization — plain numpy, no pickle of code) plus a JSON header
with epoch / best metrics / the full config (the config-in-checkpoint
contract that --auto_test relies on, reference main.py:218-233).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax
import numpy as np

from vdetr_tpu.config import VDETRConfig, AUTO_TEST_IGNORE_KEYS

STATE_FILE = "state.msgpack"
HEADER_FILE = "header.json"
LATEST = "checkpoint"
BEST = "checkpoint_best"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(checkpoint_dir: str, state, cfg: VDETRConfig,
                    epoch: int, best_val_metrics: Optional[Dict] = None,
                    filename: str = LATEST) -> str:
    path = os.path.join(checkpoint_dir, filename)
    os.makedirs(path, exist_ok=True)
    blob = flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(_to_host(state))
    )
    with open(os.path.join(path, STATE_FILE), "wb") as f:
        f.write(blob)
    header = {
        "epoch": epoch,
        "best_val_metrics": best_val_metrics or {},
        "config": dataclasses.asdict(cfg),
        "format_version": 1,
    }
    with open(os.path.join(path, HEADER_FILE), "w") as f:
        json.dump(header, f, indent=1, default=str)
    return path


def load_checkpoint(path: str, state_template) -> Tuple[Any, Dict]:
    with open(os.path.join(path, STATE_FILE), "rb") as f:
        tree = flax.serialization.msgpack_restore(f.read())
    state = flax.serialization.from_state_dict(state_template, tree)
    with open(os.path.join(path, HEADER_FILE)) as f:
        header = json.load(f)
    return state, header


def load_config(path: str) -> Tuple[VDETRConfig, Dict]:
    with open(os.path.join(path, HEADER_FILE)) as f:
        header = json.load(f)
    raw = dict(header["config"])
    # JSON round-trips tuples as lists
    for k in ("grid_extent", "mesh_shape", "mesh_axis_names"):
        if k in raw and isinstance(raw[k], list):
            raw[k] = tuple(raw[k])
    # None fields serialized as the string "None" via default=str
    for k, v in raw.items():
        if v == "None":
            raw[k] = None
    return VDETRConfig(**raw), header


def auto_reload_config(cli_cfg: VDETRConfig, ckpt_path: str) -> VDETRConfig:
    """--auto_test: take model hyperparams from the checkpoint, keep
    test/NMS/IO flags from the CLI (reference main.py:218-233)."""
    ckpt_cfg, _ = load_config(ckpt_path)
    merged = dataclasses.asdict(ckpt_cfg)
    cli = dataclasses.asdict(cli_cfg)
    for k in AUTO_TEST_IGNORE_KEYS:
        if k in cli:
            merged[k] = cli[k]
    return VDETRConfig(**merged)


def resume_if_possible(checkpoint_dir: Optional[str], state_template):
    """Reference utils/io.py:33-58: resume from `<dir>/checkpoint` when it
    exists. Returns (state_or_template, epoch, best_val_metrics)."""
    if not checkpoint_dir:
        return state_template, -1, {}
    path = os.path.join(checkpoint_dir, LATEST)
    if not os.path.isdir(path):
        return state_template, -1, {}
    state, header = load_checkpoint(path, state_template)
    return state, int(header.get("epoch", -1)), header.get(
        "best_val_metrics", {}
    )
