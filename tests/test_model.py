"""Model forward tests on a tiny config (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.models import build_model


def tiny_config(**kw):
    base = dict(
        voxel_capacity=2048,
        min_stage_capacity=128,
        grid_extent=(128, 128, 64),
        preenc_npoints=128,
        nqueries=64,
        dec_nlayers=3,          # 1 FFN + 2 decoder layers
        dec_dim=32,
        dec_ffn_dim=32,
        dec_nhead=4,
        rpe_dim=16,
        inplanes=8,
        enc_dim=32,
        fps_impl="jax",
        num_points=512,
    )
    base.update(kw)
    return VDETRConfig(**base)


def make_inputs(rng, B=2, N=512):
    pts = rng.rand(B, N, 3).astype(np.float32) * np.array([1.2, 1.2, 0.6],
                                                          np.float32)
    return {
        "point_clouds": jnp.asarray(pts),
        "point_cloud_dims_min": jnp.asarray(pts.min(1)),
        "point_cloud_dims_max": jnp.asarray(pts.max(1)),
    }


@pytest.fixture(scope="module")
def model_and_vars():
    rng = np.random.RandomState(0)
    cfg = tiny_config()
    ds = ScannetDatasetConfig()
    model = build_model(cfg, ds)
    inputs = make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    return cfg, model, variables, inputs


def test_forward_shapes(model_and_vars):
    cfg, model, variables, inputs = model_and_vars
    out = model.apply(variables, inputs, train=False)
    B, nq = 2, cfg.nqueries
    final = out["outputs"]
    assert final["sem_cls_logits"].shape == (B, nq, 18)
    assert final["box_corners"].shape == (B, nq, 8, 3)
    assert final["center_unnormalized"].shape == (B, nq, 3)
    assert final["objectness_prob"].shape == (B, nq)
    assert len(out["aux_outputs"]) == cfg.dec_nlayers - 1
    # layer-0 head is binary (is_bilable)
    assert out["aux_outputs"][0]["sem_cls_logits"].shape == (B, 128, 1)
    assert out["enc_outputs"]["point_cls_logits"].shape == (B, 128, 18)
    assert out["seed_xyz"].shape == (B, 128, 3)


def test_forward_finite_and_boxes_sane(model_and_vars):
    cfg, model, variables, inputs = model_and_vars
    out = model.apply(variables, inputs, train=False)
    final = out["outputs"]
    for k, v in final.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
    # predicted sizes positive
    assert (np.asarray(final["size_unnormalized"]) > 0).all()
    # centers near the scene (priors are seed positions; offsets are
    # zero-init so centers should lie inside the scene bounds initially)
    c = np.asarray(final["center_unnormalized"])
    assert (c >= -1.0).all() and (c <= 3.0).all()


def test_forward_jits_and_is_deterministic(model_and_vars):
    cfg, model, variables, inputs = model_and_vars
    f = jax.jit(lambda v, i: model.apply(v, i, train=False))
    o1 = f(variables, inputs)
    o2 = f(variables, inputs)
    np.testing.assert_allclose(
        np.asarray(o1["outputs"]["sem_cls_logits"]),
        np.asarray(o2["outputs"]["sem_cls_logits"]),
    )


def test_train_mode_runs_with_dropout_and_batchstats(model_and_vars):
    cfg, model, variables, inputs = model_and_vars
    out, mutated = model.apply(
        variables, inputs, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    assert np.isfinite(
        np.asarray(out["outputs"]["sem_cls_logits"])
    ).all()


def test_gradients_flow_to_backbone(model_and_vars):
    cfg, model, variables, inputs = model_and_vars

    def loss_fn(params):
        out = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            inputs, train=False,
        )
        return (out["outputs"]["center_unnormalized"] ** 2).mean() + (
            out["outputs"]["sem_cls_logits"] ** 2
        ).mean()

    g = jax.grad(loss_fn)(variables["params"])
    stem = g["pre_encoder"]["conv1"]["kernel"]
    assert float(jnp.abs(stem).sum()) > 0, "no gradient reached the stem"
    # RPE tables get gradients through the decoder
    cpb = g["decoder"]["layer0"]["cross_attn"]["cpb_mlp0"]["fc1"]["kernel"]
    assert float(jnp.abs(cpb).sum()) > 0
