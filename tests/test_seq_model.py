"""Key-sharded (seq-parallel) decoder + train step on the 8-CPU mesh.

BASELINE config "large-scene stress": points/seeds shard across a "seq"
mesh axis, decoder queries stay replicated, cross-attention combines
per-shard logits with one pmax/psum (parallel/seq_attention.py). The
decoder path is EXACT: sharded forward must match the dense forward on
the same tokens. The backbone in seq mode is shard-local (boundary voxels
may duplicate across shards), so the end-to-end check is train-step
health, not bit parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.models.transformer import TransformerDecoder
from vdetr_tpu.parallel import make_mesh


def decoder_cfg(**kw):
    base = dict(
        nqueries=16, dec_nlayers=3, dec_dim=32, dec_ffn_dim=32, dec_nhead=4,
        rpe_dim=8, preenc_npoints=64, mlp_dropout=0.0, dec_dropout=0.0,
    )
    base.update(kw)
    return VDETRConfig(**base)


def make_enc(rng, B=2, n=64, C=32):
    ds = ScannetDatasetConfig()
    feats = rng.randn(B, n, C).astype(np.float32) * 0.3
    xyz = rng.rand(B, n, 3).astype(np.float32) * 4
    dmin = xyz.min(1)
    dmax = xyz.max(1)
    scene = dmax - dmin
    sizes = np.broadcast_to(np.array([0.6, 0.6, 0.9], np.float32),
                            (B, n, 3))
    enc_pred = {
        "center_unnormalized": xyz,
        "center_normalized": (xyz - dmin[:, None]) / scene[:, None],
        "size_unnormalized": sizes,
        "size_normalized": sizes / scene[:, None],
    }
    return (jnp.asarray(feats), jnp.asarray(xyz),
            [jnp.asarray(dmin), jnp.asarray(dmax)],
            {k: jnp.asarray(v) for k, v in enc_pred.items()})


def test_seq_sharded_decoder_matches_dense(rng):
    ds = ScannetDatasetConfig()
    cfg_dense = decoder_cfg()
    cfg_seq = decoder_cfg(mesh_axis_names=("seq",))
    assert cfg_seq.seq_axis == "seq"

    feats, xyz, dims, enc_pred = make_enc(rng)
    mk = lambda c: TransformerDecoder(
        c, ds.num_semcls, ds.num_angle_bin,
        np.asarray(ds.mean_size_arr, np.float32),
    )
    dense = mk(cfg_dense)
    variables = dense.init(jax.random.PRNGKey(0), feats, xyz, dims,
                           enc_pred)
    want = dense.apply(variables, feats, xyz, dims, enc_pred)

    mesh = make_mesh(("seq",), (-1,))
    sharded = mk(cfg_seq)

    def local(v, feats, xyz, dmin, dmax, enc_pred):
        return sharded.apply(v, feats, xyz, [dmin, dmax], enc_pred)

    f = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, "seq"), P(None, "seq"), P(), P(),
                  P(None, "seq")),
        out_specs=P(),
        check_vma=False,
    ))
    got = f(variables, feats, xyz, dims[0], dims[1], enc_pred)
    for key in ("sem_cls_logits", "center_unnormalized", "objectness_prob"):
        np.testing.assert_allclose(
            np.asarray(got["outputs"][key]),
            np.asarray(want["outputs"][key]),
            atol=2e-4, rtol=1e-3,
        )
    for k_aux in range(len(want["aux_outputs"])):
        np.testing.assert_allclose(
            np.asarray(got["aux_outputs"][k_aux]["sem_cls_logits"]),
            np.asarray(want["aux_outputs"][k_aux]["sem_cls_logits"]),
            atol=2e-4, rtol=1e-3,
        )


def test_seq_train_step_runs_and_learns(rng):
    """Full dp x sp train step on a (data=2, seq=4) mesh: loss finite and
    decreasing over a few steps on a fixed batch."""
    from vdetr_tpu.data.synthetic import SyntheticDetectionDataset, collate
    from vdetr_tpu.models import build_model
    from vdetr_tpu.train.engine import Trainer

    cfg = VDETRConfig(
        mesh_axis_names=("data", "seq"), mesh_shape=(2, 4),
        voxel_capacity=512, min_stage_capacity=64,
        grid_extent=(64, 64, 32), preenc_npoints=16, nqueries=32,
        dec_nlayers=2, dec_dim=32, dec_ffn_dim=32, rpe_dim=8, inplanes=8,
        enc_dim=32, fps_impl="jax", num_points=512, repeat_num=2,
        mlp_dropout=0.0, dec_dropout=0.0, max_epoch=2,
    )
    ds = ScannetDatasetConfig()
    mesh = make_mesh(cfg.mesh_axis_names, cfg.mesh_shape)
    model = build_model(cfg, ds, axis_name=cfg.mesh_axis_names)
    data = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                     num_scenes=2, max_objects=3)
    batch = collate([data[i] for i in range(2)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    trainer = Trainer(cfg, model, ds, mesh, steps_per_epoch=4)
    assert trainer.seq == "seq"
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    rngk = jax.random.PRNGKey(1)
    for i in range(16):
        rngk, srng = jax.random.split(rngk)
        state, loss, loss_dict = trainer.train_step(state, batch, srng,
                                                    retries=0)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    # smoothed decrease past LR warmup: single-step deltas early on are
    # noise (a 4-step flat patch appeared when the synthetic scenes went
    # to realistic surface density; measured trajectory only turns down
    # after ~10 steps of the 36-step warmup ramp)
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
