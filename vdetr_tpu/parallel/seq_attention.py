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


def combine_sharded_logits(logits_local, v_local, axis_name: str,
                           dropout_fn: Optional[Callable] = None):
    """Streaming-softmax combine for logits computed on a local key shard.

    logits_local: (B, H, nQ, nK_loc) with invalid keys already masked to a
    large negative; v_local: (B, nK_loc, hd) shared single head.
    dropout_fn (optional) is applied to the unnormalized local exp weights
    — mathematically identical to dropping normalized probabilities,
    because the denominator never sees dropout.
    Returns (B, nQ, H, hd) — identical on every member of `axis_name`.
    """
    # the max is a pure numerical stabilizer (cancels in the softmax), so
    # it carries no gradient — and pmax has no differentiation rule anyway
    m_loc = jax.lax.stop_gradient(logits_local.max(axis=-1))
    m_safe = jnp.where(jnp.isfinite(m_loc), m_loc, -1e30)
    m_glob = jax.lax.pmax(m_safe, axis_name)
    p = jnp.exp(logits_local - m_glob[..., None])       # (B, H, nQ, nK_loc)
    l_glob = jax.lax.psum(p.sum(-1), axis_name)         # (B, H, nQ)
    if dropout_fn is not None:
        p = dropout_fn(p)
    o_glob = jax.lax.psum(
        jnp.einsum("bhqk,bkd->bhqd", p, v_local), axis_name
    )
    out = o_glob / jnp.maximum(l_glob[..., None], 1e-20)
    return jnp.transpose(out, (0, 2, 1, 3))


def global_topk_sharded(scores_local, nq: int, axis_name: str):
    """Global top-nq over a sharded score axis.

    scores_local: (B, n_loc) on each device. Returns (global_idx (B, nq)
    int32 in global coordinates, shard offset int32 of this device).
    Deterministic: ties broken by global index.
    """
    n_loc = scores_local.shape[1]
    idx = jax.lax.axis_index(axis_name)
    all_scores = jax.lax.all_gather(scores_local, axis_name, axis=1,
                                    tiled=True)           # (B, n_glob)
    _, topk = jax.lax.top_k(all_scores, nq)
    return topk.astype(jnp.int32), idx * n_loc


def gather_selected_sharded(x_local, global_idx, shard_offset,
                            axis_name: str):
    """Gather rows of a key-sharded tensor at replicated global indices.

    x_local: (B, n_loc, ...); global_idx: (B, nq) global row ids.
    Each device contributes the rows it owns; a psum assembles the
    replicated (B, nq, ...) result.
    """
    n_loc = x_local.shape[1]
    local = global_idx - shard_offset
    mine = (local >= 0) & (local < n_loc)
    safe = jnp.clip(local, 0, n_loc - 1)
    extra = x_local.ndim - 2
    idx = safe.reshape(safe.shape + (1,) * extra)
    g = jnp.take_along_axis(x_local, idx, axis=1)
    mask = mine.reshape(mine.shape + (1,) * extra)
    return jax.lax.psum(jnp.where(mask, g, 0), axis_name)


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
