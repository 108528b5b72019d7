"""Windowed Mosaic kernel-map builder (ops/map_kernel.py) vs the
double-sort path (sparse_conv._zrun_neighbors), interpret mode on CPU.

The map kernel must be BIT-IDENTICAL to the sort path: a wrong neighbor
index silently drops or corrupts a conv tap. Reference semantics:
MinkowskiEngine coordinate-manager kernel maps (models/mink_resnet.py
via ME internals).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.ops import map_kernel as mk
from vdetr_tpu.ops import sparse_conv as sc
from vdetr_tpu.ops.voxelize import downsample_grid, voxelize

from tests.test_window_conv import _comb_wall_grid, _grid


def _ref_map(grid):
    return jax.vmap(
        lambda c, k, v: sc._zrun_neighbors(k, c, v, grid.extent, 1)
    )(grid.coords, grid.keys, grid.valid)


def _kernel_map(grid, **kw):
    return mk.stencil_map(grid.keys, grid.coords, grid.valid,
                          grid.extent, interpret=True, **kw)


def test_map_kernel_parity_clustered():
    rng = np.random.RandomState(11)
    grid = _grid(rng, V=512, B=2)
    ref = _ref_map(grid)
    got, n_unpatched = _kernel_map(grid)
    assert int(n_unpatched) == 0
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_map_kernel_parity_comb_wall():
    """The scattered-neighbor layout: bad rows must be patched exactly."""
    grid = _comb_wall_grid()
    ref = _ref_map(grid)
    got, n_unpatched = _kernel_map(grid)
    assert int(n_unpatched) == 0
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_map_kernel_adversarial_uniform():
    """Uniform sparse points: huge rank jumps. Either patched exactly or
    flagged for fallback — never silently wrong."""
    rng = np.random.RandomState(12)
    grid = _grid(rng, V=512, clustered=False)
    ref = _ref_map(grid)
    got, n_unpatched = _kernel_map(grid)
    if int(n_unpatched) == 0:
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # else: sparse_conv routes through the sort path via lax.cond


def test_map_kernel_tiny_budget_flags_overflow():
    """With a 1-row fix budget the comb-wall layout must report
    unpatched rows (the integration's fallback trigger)."""
    grid = _comb_wall_grid()
    _, n_unpatched = _kernel_map(grid, fix_budget=1)
    assert int(n_unpatched) > 0


def test_map_kernel_stride2_parity():
    rng = np.random.RandomState(13)
    grid = _grid(rng, V=512, B=2)
    out_grid = downsample_grid(grid, 256)
    ref = jax.vmap(
        lambda oc, ov, ik: sc._zrun_neighbors(ik, oc * 2, ov,
                                              grid.extent, 1)
    )(out_grid.coords, out_grid.valid, grid.keys)
    got, n_unpatched = mk.stencil_map(
        grid.keys, out_grid.coords * 2, out_grid.valid, grid.extent,
        interpret=True)
    assert int(n_unpatched) == 0
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_kernel_map_dispatch_parity():
    """sparse_conv.kernel_map with window_interpret=True routes through
    the map kernel (+ cond fallback) and must equal the sort path."""
    rng = np.random.RandomState(14)
    for clustered in (True, False):
        grid = _grid(rng, V=512, clustered=clustered)
        ref = _ref_map(grid)
        got = sc.kernel_map(grid, 3, window_interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_isolated_sites_all_miss():
    """Isolated voxels: only the center tap hits (self-index)."""
    V = 256
    pts = (np.arange(V)[:, None] * np.array([1.0, 0.7, 0.3]))[None]
    grid = voxelize(jnp.asarray(pts, jnp.float32),
                    jnp.asarray(pts, jnp.float32),
                    jnp.ones((1, V), bool), voxel_size=0.05, capacity=V)
    got, n_unpatched = _kernel_map(grid)
    assert int(n_unpatched) == 0
    nbr = np.asarray(got)[0]
    valid = np.asarray(grid.valid)[0]
    # center tap (offset 13) is the identity on valid rows
    np.testing.assert_array_equal(nbr[13][valid],
                                  np.arange(V)[valid])
    others = [k for k in range(27) if k != 13]
    assert (nbr[others][:, valid] == V).all()
