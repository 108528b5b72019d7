"""VDETR: the full detector (reference models/model_vdetr.py).

Pipeline (one jit-compilable function of padded, static-shape inputs):
  voxelize @ 1cm -> SparseResNet34 -> FPN top-down to stride 4 ->
  furthest-point-sample 4096 seeds -> seed cls head + anchor boxes ->
  TransformerDecoder (top-1024 proposals, 8 RPE cross-attn layers).

The reference's per-sample Python loops around voxelization and FPS
(model_vdetr.py:250-313) are replaced by batched padded ops; everything
below runs under one `jax.jit`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.geometry.boxes import box_parametrization_to_corners
from vdetr_tpu.models.backbone import (
    FPNOutBlock,
    FPNUpBlock,
    SparseResNet,
)
from vdetr_tpu.models.mlp import GenericMLP
from vdetr_tpu.models.position_embedding import PositionEmbeddingCoordsSine
from vdetr_tpu.models.transformer import PointClsHead, TransformerDecoder
from vdetr_tpu.ops.fps import furthest_point_sample
from vdetr_tpu.ops.voxelize import voxelize


class VDETR(nn.Module):
    cfg: VDETRConfig
    num_semcls: int
    num_angle_bin: int
    mean_size_arr: Any       # (num_semcls, 3) numpy array
    axis_name: Optional[str] = None

    def _backbone_feats(self, point_clouds):
        c = self.cfg
        if c.use_color and c.xyz_color:
            return point_clouds          # xyz + rgb (+ normals)
        if c.use_color:
            return point_clouds[..., 3:]  # rgb (+ normals)
        if c.use_normals:
            return point_clouds          # xyz + normals (point_dim == 6,
                                          # reference build_backbone :400-401)
        # reference intent for the no-color path (model_vdetr.py:258-259,
        # which has a latent NameError): features = raw xyz
        return point_clouds[..., :3]

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False,
                 debug_stop: int = 0):
        """debug_stop (static under jit): early-return a digest after
        stage k — 1 voxelize, 2 backbone, 3 FPN, 4 FPS, 5 heads/anchors —
        for on-chip fault bisection (tools/fwd_bisect.py). 0 = full."""
        c = self.cfg
        point_clouds = inputs["point_clouds"]
        dims_min = inputs["point_cloud_dims_min"]
        dims_max = inputs["point_cloud_dims_max"]
        point_valid = inputs.get(
            "point_validity",
            jnp.ones(point_clouds.shape[:2], bool),
        )
        point_cloud_dims = [dims_min, dims_max]

        # ---- voxelize + sparse backbone (reference run_encoder) ----
        caps = c.stage_capacities()
        # bf16 matmuls with fp32 accumulation when compute_dtype says so
        # (params/norms/residuals stay fp32)
        cdtype = (jnp.bfloat16 if c.compute_dtype == "bfloat16" else None)
        grid = voxelize(
            point_clouds[..., :3],
            self._backbone_feats(point_clouds),
            point_valid,
            voxel_size=c.voxel_size,
            capacity=caps[0],
            extent=c.grid_extent,
        )
        if debug_stop == 1:
            return {"digest": grid.features.sum() + grid.valid.sum()}
        stages = SparseResNet(
            depth=c.depth,
            inplanes=c.inplanes,
            num_stages=c.num_stages,
            stem_bn=c.stem_bn,
            stage_capacities=caps[1:],
            axis_name=self.axis_name,
            compute_dtype=cdtype,
            name="pre_encoder",
        )(grid, train)
        if debug_stop == 2:
            return {"digest": sum(s.features.sum() for s in stages)}

        # ---- FPN top-down (reference model_vdetr.py:266-278) ----
        expansion = 4 if c.depth >= 50 else 1  # Bottleneck depths
        channels = [c.inplanes * 2 ** i * expansion
                    for i in range(c.num_stages)]
        x = stages[-1]
        for i in range(c.num_stages - 1, c.layer_idx - 1, -1):
            if c.use_fpn and i < c.num_stages - 1:
                up = FPNUpBlock(
                    channels[i],
                    woexpand_conv=c.woexpand_conv,
                    generative_capacity=caps[i + 1],
                    axis_name=self.axis_name,
                    compute_dtype=cdtype,
                    name=f"up_block_{i + 1}",
                )(x, stages[i], train)
                fsum = (stages[i].features.astype(jnp.float32)
                        + up.features.astype(jnp.float32))
                # skip-add in f32, re-stored at the backbone dtype (bf16
                # residency halves the next conv's gather bytes)
                x = stages[i].replace(
                    features=fsum if cdtype is None else fsum.astype(cdtype)
                )
            elif not c.use_fpn:
                x = stages[i]
            if i == c.layer_idx:
                out = FPNOutBlock(c.enc_dim, axis_name=self.axis_name,
                                  compute_dtype=cdtype,
                                  name=f"out_block_{i}")(x, train)

        if debug_stop == 3:
            return {"digest": out.features.sum()}

        # ---- FPS to 4096 seeds (reference FPSModule) ----
        vox_xyz = out.world_xyz() * out.valid[..., None]
        vox_valid = out.valid
        vox_feats = out.features
        if c.random_fps and self.has_rng("dropout"):
            # permute voxels before FPS so the greedy start (always index 0)
            # is randomized (reference model_vdetr.py:301-305; the reference
            # reads this flag without ever defining it — latent bug)
            B, V = vox_valid.shape
            perm = jax.vmap(
                lambda k: jax.random.permutation(k, V)
            )(jax.random.split(self.make_rng("dropout"), B))
            vox_xyz = jnp.take_along_axis(vox_xyz, perm[..., None], axis=1)
            vox_feats = jnp.take_along_axis(vox_feats, perm[..., None],
                                            axis=1)
            vox_valid = jnp.take_along_axis(vox_valid, perm, axis=1)
        seed_inds = furthest_point_sample(vox_xyz, c.preenc_npoints,
                                          impl=c.fps_impl)
        enc_xyz = jnp.take_along_axis(vox_xyz, seed_inds[..., None], axis=1)
        enc_features = jnp.take_along_axis(
            vox_feats, seed_inds[..., None], axis=1
        )
        # Invariant: with fewer valid voxels than preenc_npoints, FPS
        # returns duplicated indices (candidates exhaust and argmax falls
        # back to the first max). seed_valid masks seeds that landed on
        # padded (invalid) voxel rows so they never win top-k proposal
        # selection or receive cross-attention mass.
        seed_valid = jnp.take_along_axis(vox_valid, seed_inds, axis=1)
        if debug_stop == 4:
            return {"digest": enc_features.sum() + enc_xyz.sum()
                    + seed_valid.sum()}

        # ---- projection + seed classification + anchors ----
        enc_features = GenericMLP(
            hidden_dims=[] if c.proj_nohid else [c.enc_dim],
            output_dim=c.dec_dim,
            norm="bn1d",
            activation="relu",
            output_use_activation=True,
            output_use_norm=True,
            output_use_bias=False,
            axis_name=self.axis_name,
            name="encoder_to_decoder_projection",
        )(enc_features, train)

        point_cls_logits = PointClsHead(
            c, self.num_semcls, axis_name=self.axis_name,
            name="pointcls_heads",
        )(enc_features, train)

        class_idx = jnp.argmax(jax.nn.sigmoid(point_cls_logits), axis=-1)
        if c.hard_anchor:
            size_per_class = jnp.ones((self.num_semcls, 3), jnp.float32)
        else:
            size_per_class = jnp.asarray(self.mean_size_arr, jnp.float32)
        size_un = size_per_class[class_idx]

        scene = (dims_max - dims_min)[:, None, :]
        query_xyz = enc_xyz
        B = query_xyz.shape[0]
        enc_box_predictions = {
            "point_cls_logits": point_cls_logits,
            "center_unnormalized": query_xyz,
            "center_normalized": (query_xyz - dims_min[:, None, :]) / scene,
            "size_unnormalized": size_un,
            "size_normalized": size_un / scene,
        }
        enc_box_predictions["box_corners"] = box_parametrization_to_corners(
            query_xyz, size_un,
            jnp.zeros((B, query_xyz.shape[1]), jnp.float32),
        )

        if debug_stop == 5:
            return {"digest": point_cls_logits.sum()
                    + enc_box_predictions["box_corners"].sum()}

        if not c.querypos_mlp:
            # non-default path: Fourier query embedding (kept for API and
            # checkpoint parity; the decoder recomputes per-layer pos)
            pos = PositionEmbeddingCoordsSine(
                d_pos=c.dec_dim, name="pos_embedding"
            )(query_xyz, input_range=point_cloud_dims)
            GenericMLP(
                hidden_dims=[c.dec_dim], output_dim=c.dec_dim,
                hidden_use_bias=True, output_use_activation=True,
                activation="relu", name="query_projection",
            )(pos, train)

        box_predictions = TransformerDecoder(
            c, self.num_semcls, self.num_angle_bin, self.mean_size_arr,
            axis_name=self.axis_name, name="decoder",
        )(enc_features, enc_xyz, point_cloud_dims, enc_box_predictions,
          enc_valid=seed_valid, train=train)

        box_predictions["seed_inds"] = seed_inds
        box_predictions["seed_xyz"] = enc_xyz
        box_predictions["enc_outputs"] = enc_box_predictions
        return box_predictions


def build_model(cfg: VDETRConfig, dataset_config,
                axis_name: Optional[str] = None) -> VDETR:
    """reference models/__init__.py:8 + model_vdetr.py:450-474."""
    cfg.validate()
    return VDETR(
        cfg=cfg,
        num_semcls=dataset_config.num_semcls,
        num_angle_bin=dataset_config.num_angle_bin,
        mean_size_arr=np.asarray(dataset_config.mean_size_arr, np.float32),
        axis_name=axis_name,
    )
