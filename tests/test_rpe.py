"""RPE parity: trilinear_sample vs torch F.grid_sample, log-quantize math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.ops.rpe import log_quantize, make_coords_table, trilinear_sample

torch = pytest.importorskip("torch")


def test_trilinear_matches_torch_grid_sample(rng):
    n, H = 10, 4
    table = rng.randn(n, n, n, H).astype(np.float32)
    pts = (rng.rand(500, 3).astype(np.float32) * 2.4 - 1.2)  # incl. out-of-range
    got = np.asarray(trilinear_sample(jnp.asarray(table), jnp.asarray(pts)))

    # torch: input (1, H, D, Hh, W) with D,Hh,W = table axes 0,1,2;
    # grid (1,1,1,P,3) with grid[...,0]->W, 1->Hh, 2->D
    t = torch.from_numpy(table).permute(3, 0, 1, 2)[None]
    g = torch.from_numpy(pts).view(1, 1, 1, -1, 3)
    want = torch.nn.functional.grid_sample(
        t, g, mode="bilinear", align_corners=False, padding_mode="zeros"
    )[0, :, 0, 0].T.numpy()  # (P, H)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_log_quantize_properties():
    d = jnp.asarray([-2.0, -0.1, 0.0, 0.1, 2.0])
    q = np.asarray(log_quantize(d, 512.0, 4.0))
    assert q[2] == 0.0
    assert (np.sign(q) == np.sign(np.asarray(d))).all()
    assert (np.abs(q[0]) > np.abs(q[1]))
    # reference formula check at a point
    want = np.sign(2.0) * np.log2(2.0 * 512 + 1) / np.log2(8) / 4.0
    np.testing.assert_allclose(q[4], want, rtol=1e-6)


def test_coords_table_layout():
    tbl = np.asarray(make_coords_table(4.0, 10))
    assert tbl.shape == (1000, 3)
    # axis order: component 2 varies fastest
    np.testing.assert_allclose(tbl[0], [-4, -4, -4])
    np.testing.assert_allclose(tbl[1], [-4, -4, -4 + 8 / 9])
    np.testing.assert_allclose(tbl[10], [-4, -4 + 8 / 9, -4])
    np.testing.assert_allclose(tbl[100], [-4 + 8 / 9, -4, -4])


def test_object_frame_rotation_equivalence(rng):
    """The world-frame (x,y)-rotation used in the attention scan must equal
    the reference's flip->roty->flip chain (vdetr_transformer.py:712-720)."""
    d = rng.randn(50, 3).astype(np.float64)
    ang = rng.rand() * 2 * np.pi - np.pi

    # reference chain: world -> camera (x, -z, y), @ roty(ang), camera -> world
    cam = np.stack([d[:, 0], -d[:, 2], d[:, 1]], 1)
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    cam2 = cam @ R
    world = np.stack([cam2[:, 0], cam2[:, 2], -cam2[:, 1]], 1)

    # our direct form: rotz(+ang) on (x, y), z unchanged
    got = np.stack(
        [d[:, 0] * c - d[:, 1] * s, d[:, 0] * s + d[:, 1] * c, d[:, 2]], 1
    )
    np.testing.assert_allclose(got, world, atol=1e-12)


def test_trilinear_matmul_equals_split():
    from vdetr_tpu.ops.rpe import (
        trilinear_sample_matmul,
        trilinear_sample_split,
    )

    rng = np.random.RandomState(5)
    table = jnp.asarray(rng.randn(10, 10, 10, 4).astype(np.float32))
    # in-range, out-of-range, and exactly-on-boundary sample points
    pts = rng.uniform(-1.4, 1.4, size=(3, 7, 11, 3)).astype(np.float32)
    pts[0, 0, 0] = [-1.0, 1.0, 0.0]
    pts[0, 0, 1] = [1.0, -1.0, 1.0]
    p0, p1, p2 = (jnp.asarray(pts[..., i]) for i in range(3))
    want = np.asarray(trilinear_sample_split(table, p0, p1, p2))
    got = np.asarray(trilinear_sample_matmul(table, p0, p1, p2))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    # heads_first + chunking smaller than E
    want_hf = np.asarray(
        trilinear_sample_split(table, p0, p1, p2, heads_first=True)
    )
    got_hf = np.asarray(
        trilinear_sample_matmul(table, p0, p1, p2, heads_first=True,
                                chunk=17)
    )
    np.testing.assert_allclose(got_hf, want_hf, atol=2e-5, rtol=1e-5)


def test_trilinear_matmul_grad_matches():
    from vdetr_tpu.ops.rpe import (
        trilinear_sample_matmul,
        trilinear_sample_split,
    )

    rng = np.random.RandomState(6)
    table = jnp.asarray(rng.randn(10, 10, 10, 2).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(5, 3)).astype(np.float32))

    def loss_m(t, p):
        return trilinear_sample_matmul(t, p[..., 0], p[..., 1],
                                       p[..., 2]).sum()

    def loss_s(t, p):
        return trilinear_sample_split(t, p[..., 0], p[..., 1],
                                      p[..., 2]).sum()

    gm = jax.grad(loss_m, argnums=(0, 1))(table, pts)
    gs = jax.grad(loss_s, argnums=(0, 1))(table, pts)
    for a, b in zip(gm, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)
