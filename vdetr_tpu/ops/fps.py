"""Furthest point sampling.

TPU-native replacement for the reference CUDA kernel
(third_party/pointnet2/_ext_src/src/sampling_gpu.cu:72-178). Semantics
reproduced:

- always starts at index 0;
- greedy: each step picks the point with the largest min-distance to the
  selected set (first index on ties);
- points with squared norm <= 1e-3 are never selected and never update
  the running distances (the reference kernel's `mag <= 1e-3` skip,
  sampling_gpu.cu:105). Zero-padded points are therefore automatically
  excluded, which is how padding is handled here.

Two implementations:
- `fps_jax`: lax.fori_loop over steps (runs anywhere, used for testing);
- `fps_pallas`: a Pallas kernel that keeps coordinates and the running
  min-distance entirely in VMEM, one grid program per batch row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SKIP_MAG = 1e-3
_INIT_DIST = 1e10


def _fps_single_jax(xyz, npoint):
    """xyz: (N, 3) -> (npoint,) int32."""
    n = xyz.shape[0]
    mag = (xyz * xyz).sum(-1)
    skip = mag <= _SKIP_MAG

    def step(j, carry):
        temp, old, idxs = carry
        cur = xyz[old]
        d = ((xyz - cur[None, :]) ** 2).sum(-1)
        d2 = jnp.minimum(d, temp)
        temp = jnp.where(skip, temp, d2)
        cand = jnp.where(skip, -1.0, d2)
        new = jnp.argmax(cand).astype(jnp.int32)
        idxs = idxs.at[j].set(new)
        return temp, new, idxs

    temp0 = jnp.full((n,), _INIT_DIST, xyz.dtype)
    idxs0 = jnp.zeros((npoint,), jnp.int32)
    _, _, idxs = jax.lax.fori_loop(1, npoint, step, (temp0, jnp.int32(0), idxs0))
    return idxs


def fps_jax(xyz, npoint: int):
    """xyz: (B, N, 3) -> (B, npoint) int32."""
    return jax.vmap(functools.partial(_fps_single_jax, npoint=npoint))(xyz)


_ROWS = 8  # VPU sublane count: distance arrays live as (8, N/8)


def _fps_kernel(xyz_ref, out_ref, temp, mag, xs, ys, zs):
    """One batch row. xyz_ref: (1, 3, N) in VMEM; out_ref: (1, 1, npoint).

    All per-point state (coords, running min distance, magnitude) is held
    as (8, N/8) — a (1, N) layout occupies one sublane of every 8x128
    vreg, wasting 7/8 of the VPU on every pass (measured 14 ms at
    N=65536/npoint=4096; this layout ~8x less VPU work per step).
    Scalar stores to VMEM don't lower on TPU, so index writes are masked
    full-row vector writes (cheap: one VPU pass over npoint lanes/step).
    """
    cols = xyz_ref.shape[3]
    n = _ROWS * cols
    npoint = out_ref.shape[2]
    xs[:, :] = xyz_ref[0, 0]
    ys[:, :] = xyz_ref[0, 1]
    zs[:, :] = xyz_ref[0, 2]
    x, y, z = xs[:, :], ys[:, :], zs[:, :]
    mag[:, :] = x * x + y * y + z * z
    temp[:, :] = jnp.full((_ROWS, cols), _INIT_DIST, jnp.float32)
    out_ref[0] = jnp.zeros((1, npoint), jnp.int32)
    skip = mag[:, :] <= _SKIP_MAG
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    # original index of cell (r, c) = r * cols + c (row-major reshape)
    idx_grid = (
        jax.lax.broadcasted_iota(jnp.int32, (_ROWS, cols), 0) * cols
        + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, cols), 1)
    )

    def step(j, old):
        # select the current point's coords with a masked reduction
        # (dynamic_slice on loaded values doesn't lower in Mosaic)
        sel = (idx_grid == old).astype(jnp.float32)
        cx = jnp.sum(x * sel)
        cy = jnp.sum(y * sel)
        cz = jnp.sum(z * sel)
        d = (x - cx) * (x - cx) + (y - cy) * (y - cy) + (z - cz) * (z - cz)
        d2 = jnp.minimum(d, temp[:, :])
        temp[:, :] = jnp.where(skip, temp[:, :], d2)
        cand = jnp.where(skip, -1.0, d2)
        # first-index argmax via two plain reductions (argmax lowers
        # poorly in Mosaic)
        best = jnp.max(cand)
        new = jnp.min(jnp.where(cand == best, idx_grid, n)).astype(jnp.int32)
        out_ref[0] = jnp.where(out_cols == j, new, out_ref[0])
        return new

    jax.lax.fori_loop(1, npoint, step, jnp.int32(0))


def fps_pallas(xyz, npoint: int, interpret: bool = False):
    """xyz: (B, N, 3) -> (B, npoint) int32 via a Pallas kernel.

    N is padded up to a multiple of 8 with zeros (zero rows are excluded
    from selection by the reference kernel's mag<=1e-3 rule, so padding
    never changes the result)."""
    B, N, _ = xyz.shape
    if N % _ROWS:
        pad = _ROWS - N % _ROWS
        xyz = jnp.concatenate(
            [xyz, jnp.zeros((B, pad, 3), xyz.dtype)], axis=1)
        N += pad
    cols = N // _ROWS
    # (B, 3, 8, N/8): point i lands at (i // cols, i % cols)
    xyz_t = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32).reshape(
        B, 3, _ROWS, cols)
    return pl.pallas_call(
        _fps_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, _ROWS, cols), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (B, 1, npoint) with a (1, 1, npoint) block: the trailing two
        # dims match the array (a (1, npoint) block on (B, npoint) only
        # lowers at B == 1 — Mosaic requires trailing block dims to be
        # full or 8/128-divisible)
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, cols), jnp.float32),  # temp
            pltpu.VMEM((_ROWS, cols), jnp.float32),  # mag
            pltpu.VMEM((_ROWS, cols), jnp.float32),  # x
            pltpu.VMEM((_ROWS, cols), jnp.float32),  # y
            pltpu.VMEM((_ROWS, cols), jnp.float32),  # z
        ],
        interpret=interpret,
    )(xyz_t)[:, 0, :]


def furthest_point_sample(xyz, npoint: int, impl: str = "auto"):
    """Public API (matches reference pointnet2_utils.py:48-77).

    xyz: (B, N, 3) float; returns (B, npoint) int32 indices. Padding
    convention: pad with zeros (excluded by the mag<=1e-3 rule).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jax"
    if impl == "pallas":
        return fps_pallas(xyz, npoint)
    if impl == "pallas_interpret":
        return fps_pallas(xyz, npoint, interpret=True)
    return fps_jax(xyz, npoint)
