"""Sparse ResNet backbone + FPN neck (TPU re-expression of the reference
MinkowskiEngine stack: models/mink_resnet.py and the FPN pieces of
models/model_vdetr.py:139-193, 248-279).

All modules operate on `VoxelGrid`s; parameters keep the MinkowskiEngine
kernel layout (K, C_in, C_out) so `scannet_540ep.pth` can port
weight-for-weight.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vdetr_tpu.models.norm import MaskedBatchNorm, MaskedInstanceNorm
from vdetr_tpu.ops.sparse_conv import (
    attach_kernel_map,
    level_needs_eager_map,
    sparse_conv,
    sparse_conv_down,
    sparse_conv_transpose,
    sparse_conv_transpose_generative,
)
from vdetr_tpu.ops.voxelize import downsample_grid
from vdetr_tpu.ops.voxelize import VoxelGrid

_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _store(f, compute_dtype):
    """Backbone-resident storage cast. With compute_dtype=bfloat16 the
    features BETWEEN convs live in bf16, so every sparse-conv row gather
    moves half the bytes (the gather is the backbone bottleneck —
    tools/gather_micro.py) and no per-conv cast pass is needed; the cast
    fuses into the norm/activation write. Matmul accumulation and norm
    statistics stay float32."""
    return f if compute_dtype is None else f.astype(compute_dtype)


class SparseConv(nn.Module):
    """Submanifold (stride-1) conv, kernel (k^3, C_in, C_out), no bias
    (MinkowskiConvolution default). compute_dtype (e.g. bfloat16) applies
    to the gather+matmul inner loop; accumulation stays float32."""

    out_channels: int
    kernel_size: int = 3
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: VoxelGrid) -> VoxelGrid:
        k3 = self.kernel_size ** 3
        w = self.param(
            "kernel", _kaiming,
            (k3, grid.features.shape[-1], self.out_channels),
        )
        return sparse_conv(grid, w, self.kernel_size,
                           compute_dtype=self.compute_dtype)


class SparseConvDown(nn.Module):
    """Stride-2 conv (kernel 3, or kernel 1 for the ResNet downsample)."""

    out_channels: int
    out_capacity: int
    kernel_size: int = 3
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: VoxelGrid,
                 out_grid: Optional[VoxelGrid] = None) -> VoxelGrid:
        k3 = self.kernel_size ** 3
        w = self.param(
            "kernel", _kaiming,
            (k3, grid.features.shape[-1], self.out_channels),
        )
        return sparse_conv_down(grid, w, self.out_capacity, self.kernel_size,
                                compute_dtype=self.compute_dtype,
                                out_grid=out_grid)


class SparseConvTranspose(nn.Module):
    """Kernel-2 stride-2 transpose conv evaluated at the skip grid
    (plain MinkowskiConvolutionTranspose; woexpand_conv=True default), or
    generative when `fine_sites is None`."""

    out_channels: int
    generative_capacity: Optional[int] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, coarse: VoxelGrid,
                 fine_sites: Optional[VoxelGrid] = None) -> VoxelGrid:
        w = self.param(
            "kernel", _kaiming, (8, coarse.features.shape[-1],
                                 self.out_channels)
        )
        if fine_sites is not None:
            return sparse_conv_transpose(coarse, fine_sites, w,
                                         compute_dtype=self.compute_dtype)
        assert self.generative_capacity is not None
        return sparse_conv_transpose_generative(
            coarse, w, self.generative_capacity,
            compute_dtype=self.compute_dtype,
        )


class SparseBasicBlock(nn.Module):
    """ResNet BasicBlock on voxels: conv-bn-relu-conv-bn + skip, relu.

    Reference: MinkowskiEngine.modules.resnet_block.BasicBlock as used by
    models/mink_resnet.py:62-84.
    """

    planes: int
    stride: int = 1
    out_capacity: Optional[int] = None
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: VoxelGrid, train: bool = False) -> VoxelGrid:
        cd = self.compute_dtype
        in_ch = grid.features.shape[-1]
        out_grid = None
        if self.stride == 2:
            # one site computation + one cached window geometry (or
            # kernel map, for non-keyed channel widths) for the whole
            # stage: conv2 and every later block on these sites share it
            out_grid = attach_kernel_map(
                downsample_grid(grid, self.out_capacity),
                eager_map=level_needs_eager_map(self.planes, self.planes),
            )
            out = SparseConvDown(self.planes, self.out_capacity,
                                 kernel_size=3, compute_dtype=cd,
                                 name="conv1")(grid, out_grid=out_grid)
        else:
            if grid.nbr_idx is None and grid.wk_qkey is None:
                grid = attach_kernel_map(
                    grid, eager_map=level_needs_eager_map(self.planes,
                                                          self.planes))
            out = SparseConv(self.planes, compute_dtype=cd,
                             name="conv1")(grid)
        f = MaskedBatchNorm(self.planes, use_running_average=not train,
                            axis_name=self.axis_name, name="norm1")(
            out.features, out.valid
        )
        f = _store(nn.relu(f), cd)
        out2 = SparseConv(self.planes, compute_dtype=cd,
                          name="conv2")(out.replace(features=f))
        f2 = MaskedBatchNorm(self.planes, use_running_average=not train,
                             axis_name=self.axis_name, name="norm2")(
            out2.features, out2.valid
        )
        if self.stride != 1 or in_ch != self.planes:
            if self.stride == 2:
                ds = SparseConvDown(self.planes, self.out_capacity,
                                    kernel_size=1, compute_dtype=cd,
                                    name="downsample_conv")(
                    grid, out_grid=out_grid)
            else:
                ds = SparseConv(self.planes, kernel_size=1, compute_dtype=cd,
                                name="downsample_conv")(grid)
            skip = MaskedBatchNorm(
                self.planes, use_running_average=not train,
                axis_name=self.axis_name, name="downsample_norm"
            )(ds.features, ds.valid)
        else:
            skip = grid.features
        f = nn.relu(f2 + skip.astype(f2.dtype))
        f = jnp.where(out2.valid[..., None], _store(f, cd), 0.0)
        return out2.replace(features=f)


class SparseBottleneck(nn.Module):
    """ResNet Bottleneck on voxels: 1x1 -> 3x3(stride) -> 1x1(x4) + skip
    (MinkowskiEngine.modules.resnet_block.Bottleneck, expansion 4, the
    stride on conv2 — reference mink_resnet.py:19-25 depths 50/101/152).
    """

    expansion = 4

    planes: int
    stride: int = 1
    out_capacity: Optional[int] = None
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: VoxelGrid, train: bool = False) -> VoxelGrid:
        cd = self.compute_dtype
        in_ch = grid.features.shape[-1]
        out_ch = self.planes * self.expansion

        def bn(name, feats, valid, ch):
            return MaskedBatchNorm(ch, use_running_average=not train,
                                   axis_name=self.axis_name, name=name)(
                feats, valid
            )

        if grid.nbr_idx is None and grid.wk_qkey is None:
            grid = attach_kernel_map(
                grid, eager_map=level_needs_eager_map(self.planes,
                                                      self.planes))
        out = SparseConv(self.planes, kernel_size=1, compute_dtype=cd,
                         name="conv1")(grid)
        f = _store(nn.relu(bn("norm1", out.features, out.valid,
                              self.planes)), cd)
        out = out.replace(features=f)
        out_grid = None
        if self.stride == 2:
            out_grid = attach_kernel_map(
                downsample_grid(grid, self.out_capacity),
                eager_map=level_needs_eager_map(self.planes, self.planes),
            )
            out = SparseConvDown(self.planes, self.out_capacity,
                                 kernel_size=3, compute_dtype=cd,
                                 name="conv2")(out, out_grid=out_grid)
        else:
            out = SparseConv(self.planes, compute_dtype=cd,
                             name="conv2")(out)
        f = _store(nn.relu(bn("norm2", out.features, out.valid,
                              self.planes)), cd)
        out = SparseConv(out_ch, kernel_size=1, compute_dtype=cd,
                         name="conv3")(out.replace(features=f))
        f3 = bn("norm3", out.features, out.valid, out_ch)
        if self.stride != 1 or in_ch != out_ch:
            if self.stride == 2:
                ds = SparseConvDown(out_ch, self.out_capacity,
                                    kernel_size=1, compute_dtype=cd,
                                    name="downsample_conv")(
                    grid, out_grid=out_grid)
            else:
                ds = SparseConv(out_ch, kernel_size=1, compute_dtype=cd,
                                name="downsample_conv")(grid)
            skip = bn("downsample_norm", ds.features, ds.valid, out_ch)
        else:
            skip = grid.features
        f = nn.relu(f3 + skip.astype(f3.dtype))
        f = jnp.where(out.valid[..., None], _store(f, cd), 0.0)
        return out.replace(features=f)


class SparseResNet(nn.Module):
    """MinkResNet (reference models/mink_resnet.py:8-102): stem conv k3 s2
    + norm + relu, then `num_stages` stages of blocks, each stride 2.
    Returns all stage outputs.
    """

    depth: int = 34
    inplanes: int = 64
    num_stages: int = 4
    stem_bn: bool = True
    stage_capacities: Sequence[int] = (65536, 32768, 16384, 8192, 4096)
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    ARCH = {
        18: (SparseBasicBlock, (2, 2, 2, 2)),
        34: (SparseBasicBlock, (3, 4, 6, 3)),
        50: (SparseBottleneck, (3, 4, 6, 3)),
        101: (SparseBottleneck, (3, 4, 23, 3)),
        152: (SparseBottleneck, (3, 8, 36, 3)),
    }

    @nn.compact
    def __call__(self, grid: VoxelGrid, train: bool = False):
        if self.depth not in self.ARCH:
            raise KeyError(f"unsupported sparse resnet depth {self.depth}")
        block_cls, stage_blocks = self.ARCH[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]

        x = SparseConvDown(self.inplanes, self.stage_capacities[0],
                           kernel_size=3, compute_dtype=self.compute_dtype,
                           name="conv1")(grid)
        if self.stem_bn:
            f = MaskedBatchNorm(self.inplanes, use_running_average=not train,
                                axis_name=self.axis_name, name="norm1")(
                x.features, x.valid
            )
        else:
            f = MaskedInstanceNorm(self.inplanes, name="norm1")(
                x.features, x.valid
            )
        x = x.replace(features=_store(nn.relu(f), self.compute_dtype))

        outs = []
        for i, nblocks in enumerate(stage_blocks):
            planes = self.inplanes * 2 ** i
            cap = self.stage_capacities[i + 1]
            x = block_cls(planes, stride=2, out_capacity=cap,
                          axis_name=self.axis_name,
                          compute_dtype=self.compute_dtype,
                          name=f"layer{i + 1}_block0")(x, train)
            for b in range(1, nblocks):
                x = block_cls(planes, axis_name=self.axis_name,
                              compute_dtype=self.compute_dtype,
                              name=f"layer{i + 1}_block{b}")(x, train)
            outs.append(x)
        return outs


class FPNUpBlock(nn.Module):
    """Transpose conv + BN + ELU + conv k3 + BN + ELU (reference
    model_vdetr.py:146-176, `_make_up_block`)."""

    out_channels: int
    woexpand_conv: bool = True
    generative_capacity: Optional[int] = None
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, coarse: VoxelGrid, fine_sites: Optional[VoxelGrid],
                 train: bool = False) -> VoxelGrid:
        if self.woexpand_conv:
            up = SparseConvTranspose(self.out_channels,
                                     compute_dtype=self.compute_dtype,
                                     name="up_conv")(
                coarse, fine_sites
            )
        else:
            up = SparseConvTranspose(
                self.out_channels,
                generative_capacity=self.generative_capacity,
                compute_dtype=self.compute_dtype,
                name="up_conv",
            )(coarse, None)
        f = MaskedBatchNorm(self.out_channels, use_running_average=not train,
                            axis_name=self.axis_name, name="up_norm")(
            up.features, up.valid
        )
        up = up.replace(features=_store(nn.elu(f), self.compute_dtype))
        out = SparseConv(self.out_channels, compute_dtype=self.compute_dtype,
                         name="conv")(up)
        f = MaskedBatchNorm(self.out_channels, use_running_average=not train,
                            axis_name=self.axis_name, name="norm")(
            out.features, out.valid
        )
        return out.replace(features=_store(nn.elu(f), self.compute_dtype))


class FPNOutBlock(nn.Module):
    """conv k3 + BN + ELU to `enc_dim` (reference model_vdetr.py:139-144)."""

    out_channels: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, grid: VoxelGrid, train: bool = False) -> VoxelGrid:
        out = SparseConv(self.out_channels, compute_dtype=self.compute_dtype,
                         name="conv")(grid)
        f = MaskedBatchNorm(self.out_channels, use_running_average=not train,
                            axis_name=self.axis_name, name="norm")(
            out.features, out.valid
        )
        return out.replace(features=nn.elu(f))
