"""Training / evaluation engine.

Reference engine.py rebuilt TPU-first: one jitted `train_step` =
forward + criterion + grad pmean + clip + AdamW update, executed under
`shard_map` over the data mesh axis (sync-BN statistics psum inside the
model; the reference needs DDP + MinkowskiSyncBatchNorm for the same,
main.py:511-517). The per-iteration LR (reference engine.py:52-56) is a
schedule inside the optimizer.
"""

from __future__ import annotations

import functools
import math
import time
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.train.criterion import SetCriterion
from vdetr_tpu.train.optimizer import build_optimizer
from vdetr_tpu.train.schedule import make_lr_schedule


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


INPUT_KEYS = ("point_clouds", "point_cloud_dims_min", "point_cloud_dims_max",
              "point_validity")


def _is_transient(e: Exception) -> bool:
    """Only jax runtime errors whose XLA status code is UNAVAILABLE (the
    remote-attached-TPU transient class) qualify — a user/data error that
    merely embeds the token must surface immediately."""
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:  # pragma: no cover - very old jax
        JaxRuntimeError = ()
    if not isinstance(e, JaxRuntimeError):
        return False
    first = str(e).splitlines()[0] if str(e) else ""
    return first.startswith("UNAVAILABLE") or "UNAVAILABLE:" in first


def _retry_device_errors(fn, retries: int):
    """Re-dispatch on transient accelerator failures (the reference's only
    failure behavior is sys.exit on non-finite loss, engine.py:100-102;
    remote-attached TPUs additionally surface transient UNAVAILABLE device
    errors that a re-dispatch survives). Dispatch stays async on the happy
    path when no retries are requested (callers that consume the loss value
    already synchronize); with retries > 0 the result must be observed here
    so the fault is attributable to this step."""
    if retries <= 0:
        return fn()
    for attempt in range(retries + 1):
        try:
            out = fn()
            # Fence via a host transfer of one leaf: on remote-attached
            # TPUs jax.block_until_ready returns before execution
            # completes, so a fault would otherwise surface later at an
            # unrelated sync point outside this retry scope.
            import numpy as _np

            _np.asarray(jax.tree.leaves(out)[0].ravel()[0])
            return out
        except Exception as e:  # noqa: BLE001 - classified by _is_transient
            if not _is_transient(e) or attempt == retries:
                raise
            wait = 15.0 * (attempt + 1)
            print(f"transient device error ({str(e).splitlines()[0][:100]}); "
                  f"retry {attempt + 1}/{retries} in {wait:.0f}s")
            time.sleep(wait)


def _model_inputs(batch):
    return {k: batch[k] for k in INPUT_KEYS if k in batch}


class Trainer:
    """Owns the jitted train/eval steps for one (model, criterion, mesh)."""

    def __init__(self, cfg: VDETRConfig, model, dataset_config, mesh,
                 steps_per_epoch: int, axis: str = "data"):
        self.cfg = cfg
        self.model = model
        self.dataset_config = dataset_config
        self.mesh = mesh
        self.axis = axis
        # optional "seq" mesh axis: points/seeds sharded within each scene
        # (BASELINE large-scene stress config); queries stay replicated
        self.seq = cfg.seq_axis if cfg.seq_axis in mesh.axis_names else None
        self.criterion = SetCriterion(cfg, dataset_config, axis_name=axis,
                                      seq_axis_name=self.seq)
        self.lr_schedule = make_lr_schedule(cfg, steps_per_epoch)
        self.tx = build_optimizer(cfg, self.lr_schedule)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _batch_spec(self, batch_keys):
        """Per-key PartitionSpecs: point arrays shard over (data, seq);
        GT / scalar fields shard over data only (replicated across seq)."""
        if self.seq is None:
            return P(self.axis)
        return {
            k: (P(self.axis, self.seq)
                if k in ("point_clouds", "point_validity")
                else P(self.axis))
            for k in batch_keys
        }

    # ---- state ----
    INIT_CAPACITY = 16384  # voxel capacity of the shrunken init model

    def _init_model_and_inputs(self, inputs):
        """Parameter/batch-stat SHAPES depend only on channel/head/query
        dims, never on num_points or the voxel capacities — so init runs
        a small-capacity sibling model on a sliced batch instead of
        compiling the full-size forward (which costs minutes of XLA time
        per config just to discover shapes). Same rng path + same
        shape-only initializers => bit-identical parameters
        (tests/test_train_step.py::test_small_capacity_init_matches)."""
        c = self.cfg
        cap = min(c.voxel_capacity, self.INIT_CAPACITY)
        npts = min(c.num_points, cap)
        if self.seq is not None or (cap == c.voxel_capacity
                                    and npts == c.num_points):
            return self.model, inputs
        from vdetr_tpu.models import build_model

        small = build_model(c.replace(num_points=npts, voxel_capacity=cap),
                            self.dataset_config,
                            axis_name=self.model.axis_name)
        sliced = dict(inputs)
        sliced["point_clouds"] = inputs["point_clouds"][:, :npts]
        if "point_validity" in sliced:
            sliced["point_validity"] = inputs["point_validity"][:, :npts]
        return small, sliced

    def init_state(self, rng, sample_batch) -> TrainState:
        # jitted init: eager flax init dispatches every op separately,
        # which takes ~10 min over a remote-attached TPU tunnel
        inputs = _model_inputs(sample_batch)
        init_model, inputs = self._init_model_and_inputs(inputs)
        init = lambda r, inp: init_model.init(r, inp, train=False)
        if self.seq is not None:
            # seq mode traces collectives even at init: run under shard_map
            init = shard_map(
                init, mesh=self.mesh,
                in_specs=(P(), self._batch_spec(tuple(sorted(inputs)))),
                out_specs=P(), check_vma=False,
            )
        variables = jax.jit(init)(rng, inputs)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return jax.device_put(
            state, NamedSharding(self.mesh, P())
        )

    # ---- steps ----
    def _build_train_step(self):
        axis = self.axis
        model, criterion, tx = self.model, self.criterion, self.tx

        seq = self.seq

        def per_device(state: TrainState, batch, rng):
            # fold in the DATA index only: dropout on the replicated query
            # path must be identical across seq shards or replication breaks
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

            def loss_fn(params):
                out, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    _model_inputs(batch), train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                )
                loss, loss_dict = criterion(out, batch)
                if seq is not None:
                    # differentiate the seq-mean: its transpose splits the
                    # cotangent 1/n per replica, so the psum of grads below
                    # is exact for both replicated and sharded subgraphs
                    loss = jax.lax.pmean(loss, seq)
                return loss, (loss_dict, mutated["batch_stats"])

            (loss, (loss_dict, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            if seq is not None:
                grads = jax.lax.psum(grads, seq)
            grads = jax.lax.pmean(grads, axis)
            loss_red = jax.lax.pmean(loss, axis)
            loss_dict = jax.tree.map(
                lambda x: jax.lax.pmean(x, axis), loss_dict
            )
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = TrainState(
                step=state.step + 1,
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
            )
            return new_state, loss_red, loss_dict

        # batch in_specs depend on the batch's key set (sample_valid is
        # only present in pad_last eval batches): build per key set, cached
        cache = {}

        def stepper(state, batch, rng):
            key = tuple(sorted(batch))
            if key not in cache:
                cache[key] = jax.jit(shard_map(
                    per_device,
                    mesh=self.mesh,
                    in_specs=(P(), self._batch_spec(key), P()),
                    out_specs=(P(), P(), P()),
                    check_vma=False,
                ))
            return cache[key](state, batch, rng)

        return stepper

    def _build_eval_step(self):
        model = self.model
        axis = self.axis
        cfg = self.cfg
        # device-side NMS (SURVEY §7.8 north star): when the configured
        # variant is exactly the published class-aware axis-aligned 3D NMS,
        # the keep mask is computed inside the jitted step (pick-order
        # parity-tested vs the numpy path, tests/test_nms_pib.py) and the
        # AP calculator skips its host NMS loop. Empty-box removal
        # (reference utils/ap_calculator.py:80-111: boxes with fewer than
        # empty_pt_thre of a 40k point subsample inside are dropped before
        # NMS) runs on device too when configured.
        from vdetr_tpu.eval.ap_calculator import (
            config_dict_from_cfg,
            device_nms_supported,
        )
        ap_cfg = config_dict_from_cfg(cfg, self.dataset_config)
        use_device_nms = device_nms_supported(ap_cfg)
        device_remove_empty = use_device_nms and ap_cfg["remove_empty_box"]

        def per_device(state: TrainState, batch):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                _model_inputs(batch), train=False,
            )
            final = dict(out["outputs"])
            if self.cfg.use_focal:
                final["sem_cls_prob"] = jax.nn.sigmoid(final["sem_cls_prob"])
            # keep only what the AP calculator consumes
            keep = {
                k: final[k] for k in (
                    "box_corners", "box_corners_axis_align", "sem_cls_prob",
                    "objectness_prob", "angle_prob", "center_unnormalized",
                    "size_unnormalized", "angle_continuous",
                )
            }
            if use_device_nms:
                from vdetr_tpu.geometry import (
                    nms_3d_samecls_mask,
                    points_in_boxes_all,
                )

                obj = keep["objectness_prob"]
                valid = jnp.ones(obj.shape, bool)
                if device_remove_empty:
                    boxes = jnp.concatenate(
                        [keep["center_unnormalized"],
                         keep["size_unnormalized"],
                         keep["angle_continuous"][..., None]], axis=-1,
                    )
                    boxes = boxes.at[..., 2].add(-boxes[..., 5] / 2)
                    pc = batch["point_clouds"][..., :3]
                    nsub = min(40000, pc.shape[1])
                    # fixed-key subsample: the reference draws an
                    # unseeded random 40k subset per scan
                    # (utils/ap_calculator.py:84); any subset is within
                    # protocol. Padded val points sit at the scene min
                    # and cannot fall inside boxes.
                    sel = jax.random.permutation(
                        jax.random.PRNGKey(0), pc.shape[1]
                    )[:nsub]
                    cnt = points_in_boxes_all(pc[:, sel], boxes).sum(axis=1)
                    valid = cnt >= cfg.empty_pt_thre
                    # all-empty fallback: keep the highest-objectness box
                    none = ~valid.any(axis=1, keepdims=True)
                    best = jax.nn.one_hot(
                        jnp.argmax(obj, axis=1), obj.shape[1], dtype=bool
                    )
                    valid = valid | (none & best)

                corners = keep["box_corners_axis_align" if cfg.axis_align_test
                               else "box_corners"]
                aabbs = jnp.concatenate(
                    [corners.min(axis=2), corners.max(axis=2)], axis=-1
                )
                classes = jnp.argmax(keep["sem_cls_prob"], axis=-1)
                keep["nms_keep"] = jax.vmap(
                    lambda a, s, c, vm: nms_3d_samecls_mask(
                        a, s, c, vm, cfg.nms_iou
                    )
                )(aabbs, obj, classes, valid)
            return keep

        cache = {}

        def stepper(state, batch):
            key = tuple(sorted(batch))
            if key not in cache:
                cache[key] = jax.jit(shard_map(
                    per_device,
                    mesh=self.mesh,
                    in_specs=(P(), self._batch_spec(key)),
                    out_specs=P(self.axis),
                    check_vma=False,
                ))
            return cache[key](state, batch)

        return stepper

    def train_step(self, state: TrainState, batch, rng, retries: int = 2):
        return _retry_device_errors(
            lambda: self._train_step(state, batch, rng), retries
        )

    def eval_step(self, state: TrainState, batch, retries: int = 2):
        return _retry_device_errors(
            lambda: self._eval_step(state, batch), retries
        )

    def current_lr(self, state: TrainState) -> float:
        return float(self.lr_schedule(int(state.step)))


def train_one_epoch(trainer: Trainer, state: TrainState, loader, rng,
                    epoch: int, log_every: int = 10,
                    logger: Optional[Callable[[str], None]] = print,
                    profile_dir: Optional[str] = None,
                    metrics_logger=None, log_metrics_every: int = 20):
    """Reference engine.py:59-122: iterate, step, finite-guard, log.
    profile_dir: capture a jax.profiler trace of iterations 2-4 of the
    first epoch (the reference has no tracing at all, SURVEY.md §5).
    metrics_logger: optional MetricsLogger receiving the per-iteration
    loss dict every `log_metrics_every` iterations (the reference parses
    --log_metrics_every but never reads it; here it does what it says)."""
    losses = []
    last_dict = None
    t0 = time.time()
    tracing = False
    try:
        for it, batch in enumerate(loader):
            if profile_dir and epoch == 0 and it == 2:
                jax.profiler.start_trace(profile_dir)
                tracing = True
            if tracing and it == 5:
                jax.profiler.stop_trace()
                tracing = False
            rng, step_rng = jax.random.split(rng)
            state, loss, loss_dict = trainer.train_step(state, batch,
                                                        step_rng)
            loss_val = float(loss)
            if not math.isfinite(loss_val):
                raise FloatingPointError(
                    f"Loss is not finite at epoch {epoch} iter {it}; "
                    "stopping (reference engine.py:100-102 exits here)."
                )
            losses.append(loss_val)
            last_dict = loss_dict
            if metrics_logger is not None and it % log_metrics_every == 0:
                metrics_logger.log(
                    {"loss": loss_val,
                     **{k: float(v) for k, v in loss_dict.items()}},
                    int(state.step), prefix="train_iter/",
                )
            if logger and it % log_every == 0:
                avg = sum(losses[-10:]) / len(losses[-10:])
                dt = time.time() - t0
                logger(
                    f"Epoch [{epoch}]; Iter [{it}]; Loss {avg:0.2f}; "
                    f"LR {trainer.current_lr(state):0.2e}; {dt:0.1f}s"
                )
    finally:
        if tracing:  # epochs shorter than the trace window must still close
            jax.profiler.stop_trace()
    mean_loss = sum(losses) / max(len(losses), 1)
    return state, mean_loss, last_dict


def evaluate(trainer: Trainer, state: TrainState, loader, ap_calculator,
             log_every: int = 10,
             logger: Optional[Callable[[str], None]] = print):
    """Reference engine.py:125-192. Outputs stay device-side until the AP
    calculator pulls them; no cross-rank gather is needed because a single
    process sees the whole (sharded) batch."""
    for it, batch in enumerate(loader):
        outputs = trainer.eval_step(state, batch)
        ap_calculator.step(outputs, batch)
        if logger and it % log_every == 0:
            logger(f"Evaluate; Batch [{it}]")
    return ap_calculator
