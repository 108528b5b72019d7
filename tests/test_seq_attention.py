"""Key-sharded attention == dense attention, on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vdetr_tpu.parallel import make_mesh
from vdetr_tpu.parallel.seq_attention import sharded_softmax_attention


def dense_reference(q, k, v, bias, valid):
    logits = np.einsum("bhqd,bkd->bhqk", q, k) + bias
    logits = np.where(valid[:, None, None, :], logits, -np.inf)
    logits = logits - logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bkd->bhqd", p, v)
    return out.transpose(0, 2, 1, 3)


def test_sharded_matches_dense(rng):
    B, H, nQ, nK, hd = 2, 4, 8, 64, 16
    q = rng.randn(B, H, nQ, hd).astype(np.float32)
    k = rng.randn(B, nK, hd).astype(np.float32)
    v = rng.randn(B, nK, hd).astype(np.float32)
    bias = rng.randn(B, H, nQ, nK).astype(np.float32)
    valid = np.ones((B, nK), bool)
    valid[:, -10:] = False

    mesh = make_mesh(("seq",), (-1,))
    n = mesh.devices.size

    def local(q, k, v, bias, valid):
        return sharded_softmax_attention(q, k, v, bias, valid,
                                         axis_name="seq")

    f = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, "seq"), P(None, "seq"),
                  P(None, None, None, "seq"), P(None, "seq")),
        out_specs=P(),
        check_vma=False,
    ))
    got = np.asarray(f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(bias), jnp.asarray(valid)))
    want = dense_reference(q, k, v, bias, valid)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_handles_fully_masked_shard(rng):
    """One device's entire key shard invalid: must not NaN."""
    B, H, nQ, nK, hd = 1, 2, 4, 64, 8
    q = rng.randn(B, H, nQ, hd).astype(np.float32)
    k = rng.randn(B, nK, hd).astype(np.float32)
    v = rng.randn(B, nK, hd).astype(np.float32)
    bias = np.zeros((B, H, nQ, nK), np.float32)
    valid = np.ones((B, nK), bool)
    valid[:, : nK // 8] = False  # device 0's shard fully masked

    mesh = make_mesh(("seq",), (-1,))

    def local(q, k, v, bias, valid):
        return sharded_softmax_attention(q, k, v, bias, valid,
                                         axis_name="seq")

    f = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, "seq"), P(None, "seq"),
                  P(None, None, None, "seq"), P(None, "seq")),
        out_specs=P(),
        check_vma=False,
    ))
    got = np.asarray(f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(bias), jnp.asarray(valid)))
    assert np.isfinite(got).all()
    want = dense_reference(q, k, v, bias, valid)
    np.testing.assert_allclose(got, want, atol=1e-5)
