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


def _fps_kernel(xyz_ref, out_ref, temp, mag, coords):
    """One batch row. xyz_ref: (1, 3, N) in VMEM; out_ref: (1, 1, npoint).

    temp: (1, N) running min distance; mag: (1, N); coords: (3, N) scratch.
    Scalar stores to VMEM don't lower on TPU, so index writes are masked
    full-row vector writes (cheap: one VPU pass over npoint lanes/step).
    """
    n = xyz_ref.shape[2]
    npoint = out_ref.shape[2]
    coords[:, :] = xyz_ref[0]
    x, y, z = coords[0:1, :], coords[1:2, :], coords[2:3, :]
    mag[:, :] = x * x + y * y + z * z
    temp[:, :] = jnp.full((1, n), _INIT_DIST, jnp.float32)
    out_ref[0] = jnp.zeros((1, npoint), jnp.int32)
    skip = mag[:, :] <= _SKIP_MAG
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    n_cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def step(j, old):
        # select the current point's coords with a masked reduction
        # (dynamic_slice on loaded values doesn't lower in Mosaic)
        sel = (n_cols == old).astype(jnp.float32)
        cx = jnp.sum(x * sel)
        cy = jnp.sum(y * sel)
        cz = jnp.sum(z * sel)
        d = (x - cx) * (x - cx) + (y - cy) * (y - cy) + (z - cz) * (z - cz)
        d2 = jnp.minimum(d, temp[:, :])
        temp[:, :] = jnp.where(skip, temp[:, :], d2)
        cand = jnp.where(skip, -1.0, d2)
        # first-index argmax via two plain reductions (1-D argmax lowers
        # poorly in Mosaic)
        best = jnp.max(cand)
        new = jnp.min(jnp.where(cand == best, n_cols, n)).astype(jnp.int32)
        out_ref[0] = jnp.where(out_cols == j, new, out_ref[0])
        return new

    jax.lax.fori_loop(1, npoint, step, jnp.int32(0))


def fps_pallas(xyz, npoint: int, interpret: bool = False):
    """xyz: (B, N, 3) -> (B, npoint) int32 via a Pallas kernel."""
    B, N, _ = xyz.shape
    xyz_t = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)  # (B, 3, N)
    return pl.pallas_call(
        _fps_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0),
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
            pltpu.VMEM((1, N), jnp.float32),  # temp
            pltpu.VMEM((1, N), jnp.float32),  # mag
            pltpu.VMEM((3, N), jnp.float32),  # coords
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
