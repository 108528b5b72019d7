"""Sequence-parallel (key-sharded) cross-attention for large scenes.

BASELINE config "Large-scene stress: 100k+ point clouds ... across a
v5e-8 mesh": the reference has nothing comparable (all attention is dense
single-device, SURVEY.md §5). Design: queries are tiny (1024) and
replicated; keys/values/key-coordinates are sharded along a mesh axis.
Each device computes its local logits (including the locally-computed RPE
bias — the bias depends only on (query corners, local key xyz), so no
cross-device traffic for it), a streaming-softmax partial
(max, sum-exp, weighted values), and the partials combine with one
psum/pmax over the axis. Communication: O(nQ * (1 + head_dim)) per
device — independent of the key count.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def sharded_softmax_attention(q, k_local, v_local, bias_local,
                              key_valid_local=None,
                              axis_name: Optional[str] = None):
    """Streaming-softmax attention over sharded keys.

    q: (B, H, nQ, hd); k_local/v_local: (B, nK_loc, hd) single shared
    head (V-DETR layout); bias_local: (B, H, nQ, nK_loc) additive logits.
    Returns (B, nQ, H, hd).
    """
    logits = jnp.einsum("bhqd,bkd->bhqk", q, k_local) + bias_local
    if key_valid_local is not None:
        logits = jnp.where(key_valid_local[:, None, None, :], logits, -jnp.inf)
    m_loc = logits.max(axis=-1)  # (B, H, nQ)
    # guard fully-masked shards
    m_safe = jnp.where(jnp.isfinite(m_loc), m_loc, -1e30)
    p = jnp.exp(logits - m_safe[..., None])
    if key_valid_local is not None:
        p = jnp.where(key_valid_local[:, None, None, :], p, 0.0)
    l_loc = p.sum(-1)  # (B, H, nQ)
    o_loc = jnp.einsum("bhqk,bkd->bhqd", p, v_local)

    if axis_name is not None:
        m_glob = jax.lax.pmax(m_safe, axis_name)
        scale = jnp.exp(m_safe - m_glob)
        l_glob = jax.lax.psum(l_loc * scale, axis_name)
        o_glob = jax.lax.psum(o_loc * scale[..., None], axis_name)
    else:
        m_glob, l_glob, o_glob = m_safe, l_loc, o_loc
    out = o_glob / jnp.maximum(l_glob[..., None], 1e-20)
    return jnp.transpose(out, (0, 2, 1, 3))  # (B, nQ, H, hd)


def make_sharded_rpe_cross_attention(rpe_bias_fn: Callable,
                                     axis_name: str = "data"):
    """Wrap a local-bias function into a key-sharded attention.

    rpe_bias_fn(reference_point, key_xyz_local) -> (B, H, nQ, nK_loc).
    Returns attend(q, k_local, v_local, reference_point, key_xyz_local,
    key_valid_local).
    """

    def attend(q, k_local, v_local, reference_point, key_xyz_local,
               key_valid_local=None):
        bias = rpe_bias_fn(reference_point, key_xyz_local)
        return sharded_softmax_attention(
            q, k_local, v_local, bias, key_valid_local, axis_name
        )

    return attend
