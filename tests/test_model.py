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


def test_bfloat16_compute_dtype_close_to_fp32(model_and_vars):
    """compute_dtype=bfloat16 (matmuls bf16, fp32 accumulation) must track
    the fp32 logits closely (VERDICT round-1 item 10)."""
    cfg, model, variables, inputs = model_and_vars
    out32 = model.apply(variables, inputs, train=False)
    model16 = build_model(cfg.replace(compute_dtype="bfloat16"),
                          ScannetDatasetConfig())
    out16 = model16.apply(variables, inputs, train=False)
    a = np.asarray(out32["outputs"]["sem_cls_logits"]).ravel()
    b = np.asarray(out16["outputs"]["sem_cls_logits"]).ravel()
    assert b.dtype == np.float32  # params/outputs stay fp32
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos
    # bf16 rounding can flip near-tied top-k picks, discretely remapping a
    # minority of query slots; the bulk of centers must still agree
    c = np.asarray(out32["outputs"]["center_unnormalized"]).ravel()
    d = np.asarray(out16["outputs"]["center_unnormalized"]).ravel()
    assert np.median(np.abs(c - d)) < 0.02, np.median(np.abs(c - d))


def test_pos_for_key_changes_logits_and_adds_params(model_and_vars):
    """pos_for_key adds per-layer key positional projections that feed the
    cross-attention K input (reference vdetr_transformer.py:141-145,
    416-417, 545-552)."""
    cfg, model, variables, inputs = model_and_vars
    cfg_pk = cfg.replace(pos_for_key=True)
    model_pk = build_model(cfg_pk, ScannetDatasetConfig())
    vars_pk = model_pk.init(jax.random.PRNGKey(0), inputs, train=False)
    dec = vars_pk["params"]["decoder"]
    assert "key_pos_projection0" in dec
    assert "key_pos_projection1" in dec
    out = model_pk.apply(vars_pk, inputs, train=False)
    assert np.isfinite(
        np.asarray(out["outputs"]["sem_cls_logits"])
    ).all()


def test_random_fps_permutes_under_train(model_and_vars):
    """random_fps permutes voxels before FPS when an rng is supplied
    (reference model_vdetr.py:301-305; the flag the reference reads but
    never defines)."""
    cfg, model, variables, inputs = model_and_vars
    cfg_rf = cfg.replace(random_fps=True, dec_dropout=0.0, mlp_dropout=0.0)
    model_rf = build_model(cfg_rf, ScannetDatasetConfig())
    vars_rf = model_rf.init(jax.random.PRNGKey(0), inputs, train=False)
    out1 = model_rf.apply(vars_rf, inputs, train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"])[0]
    out2 = model_rf.apply(vars_rf, inputs, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])[0]
    # different permutations -> different seed orderings
    assert not np.array_equal(np.asarray(out1["seed_xyz"]),
                              np.asarray(out2["seed_xyz"]))
    # eval (no rng) stays deterministic
    e1 = model_rf.apply(vars_rf, inputs, train=False)
    e2 = model_rf.apply(vars_rf, inputs, train=False)
    np.testing.assert_array_equal(np.asarray(e1["seed_xyz"]),
                                  np.asarray(e2["seed_xyz"]))


def test_degenerate_fps_seeds_masked(model_and_vars):
    """With fewer valid voxels than preenc_npoints, FPS duplicates indices;
    seed_valid must mask seeds on padded voxel rows so they cannot win
    top-k (VERDICT round-1 weak finding 9)."""
    cfg, model, variables, inputs = model_and_vars
    rng = np.random.RandomState(3)
    # 16 distinct points -> ~16 voxels << preenc_npoints=128
    few = rng.rand(2, 16, 3).astype(np.float32) * 1.2 + 0.05
    pts = np.zeros((2, 512, 3), np.float32)
    pts[:, :16] = few
    validity = np.zeros((2, 512), bool)
    validity[:, :16] = True
    tiny_inputs = {
        "point_clouds": jnp.asarray(pts),
        "point_validity": jnp.asarray(validity),
        "point_cloud_dims_min": jnp.asarray(few.min(1)),
        "point_cloud_dims_max": jnp.asarray(few.max(1)),
    }
    out = model.apply(variables, tiny_inputs, train=False)
    assert np.isfinite(np.asarray(out["outputs"]["sem_cls_logits"])).all()
    assert np.isfinite(np.asarray(out["outputs"]["objectness_prob"])).all()
