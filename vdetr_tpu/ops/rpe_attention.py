"""Fused vertex-RPE cross-attention (Pallas TPU kernel).

The V-DETR hotspot (reference models/vdetr_transformer.py:701-758) adds an
8-corner trilinearly-sampled bias to every (query, key) attention logit.
The materialized implementation (models/transformer.py) builds the
(B, H, nQ, nK) bias in HBM once per layer; this kernel never does — per
(q-tile, k-tile) it recomputes corner deltas, log-quantizes them, adds
the bias to the logits tile and folds it into a streaming (flash)
softmax.

The trilinear table sample is GATHER-FREE (ops/rpe.trilinear_sample_matmul
brought in-kernel): per corner the (TQ*TK,) tile elements build a
2-nonzero x 2-nonzero weight matrix P over the (d, h) grid-axis pair
with lane-iota compares — P stays in VMEM — and one MXU contraction
P (E, n^2) @ table (n^2, n*H) plus a lane-arithmetic weighted reduce
over the w axis yields all H heads at once. This both avoids Mosaic's
dynamic-gather source-width limit (which blocked the round-1 kernel)
and the 128-lane padding that makes the XLA path HBM-bound (measured
45 ms/layer XLA vs the kernel's VMEM-resident compute).

Inputs are the natural decoder layouts; this module handles the
heads-first rearrangement. `rpe_cross_attention_pallas` is the kernel
entry; `rpe_cross_attention_reference` is the materialized-bias pure-jax
path used for parity tests — both are exact to streaming-softmax
rounding. models/transformer.py dispatches between the kernel and its
own (dropout-capable) materialized path based on cfg.rpe_impl.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _quantize(delta, log_scale, max_value, n):
    """log-quantize + continuous table index (align_corners=False), fused:
    reference vdetr_transformer.py:722 + torch grid_sample indexing."""
    q = jnp.sign(delta) * jnp.log2(jnp.abs(delta) * log_scale + 1.0)
    q = q / (np.log2(8.0) * max_value)
    return ((q + 1.0) * n - 1.0) * 0.5


def _flatten_tables(tables):
    """(8, n, n, n, H) -> (8, n^2, n*H): row (d*n + h_axis), column
    (w*H + head) — the contraction layout of the in-kernel factorized
    trilinear sample."""
    C, n, _, _, H = tables.shape
    return tables.reshape(C, n * n, n * H)


def _hat(iota, idx):
    """Linear-interpolation hat weights: relu(1 - |iota - idx|).

    Exactly the two grid_sample taps (floor: 1-frac, floor+1: frac) with
    zero-padding outside the grid — out-of-range taps vanish because no
    integer lattice point is within distance 1."""
    return jnp.maximum(1.0 - jnp.abs(iota - idx), 0.0)


def _kernel(q_ref, k_ref, v_ref, corners_ref, cossin_ref, kxyz_ref,
            kvalid_ref, tables_ref, out_ref, m_ref, z_ref, acc_ref,
            *, n, H, hd, TQ, TK, log_scale, max_value, rotate):
    """Grid (B, nQ/TQ, nK/TK), k innermost. Scratch m/z/acc persist
    across the k dimension (flash-attention pattern).

    Heads are FUSED into the dot M dimension: the q block arrives as
    (H*TQ, hd) (head-major rows, wrapper pre-blocks it) so the logits and
    AV products are single M=H*TQ matmuls instead of H separate M=TQ
    ones, and the streaming-softmax state updates vectorize over all
    H*TQ rows at once. Measured: the per-head M=32 form spent ~4 ms of
    per-tile fixed cost per layer (tools/rpe_ablate.py "flash only").

    Bias layout: tile elements flatten row-major to E = TQ*TK lanes;
    per corner a (n^2, E) weight matrix P (hat(d) x hat(h), <= 4
    nonzeros per lane) contracts with the (n^2, n*H) table on the MXU,
    and the w-axis hat folds the (n*H, E) result via one constant
    head-selection matmul AFTER the corner sum. Everything lives in
    VMEM; no gathers. All dots run at the backend's default matmul
    precision (bf16 inputs / f32 accumulation on TPU — explicit bf16
    casts are no-ops, measured bit-identical)."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    E = TQ * TK
    HTQ = H * TQ

    @pl.when(ik == 0)
    def _():
        m_ref[:, :] = jnp.full((HTQ, 1), NEG_INF, jnp.float32)
        z_ref[:, :] = jnp.zeros((HTQ, 1), jnp.float32)
        acc_ref[:, :] = jnp.zeros((HTQ, hd), jnp.float32)

    k_tile = k_ref[0]                      # (TK, hd)
    v_tile = v_ref[0]                      # (TK, hd)
    kvalid = kvalid_ref[0]                 # (1, TK)
    kx = kxyz_ref[0, 0:1, :]               # (1, TK)
    ky = kxyz_ref[0, 1:2, :]
    kz = kxyz_ref[0, 2:3, :]
    if rotate:
        co = cossin_ref[0][:, 0].reshape(TQ, 1)
        si = cossin_ref[0][:, 1].reshape(TQ, 1)

    # all-head logits in one dot: (H*TQ, hd) @ (TK, hd)^T -> (H*TQ, TK)
    logits = jax.lax.dot_general(
        q_ref[0, 0], k_tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # RPE bias, 8 corners, gather-free factorized trilinear. Per corner:
    # build the (n^2, E) d/h hat-pair weight matrix P DIRECTLY in its
    # final layout (row r of the n^2 axis decodes to (r//n, r%n); the two
    # grid_sample taps per axis are exactly relu(1 - |lattice - index|)),
    # one MXU contraction with the (n^2, n*H) table, then multiply by the
    # w-axis hat expanded to (n*H, E) — again built in-layout from a
    # row//H iota. The w/head fold is ONE tiny constant selection matmul
    # (H, n*H) @ (n*H, E) AFTER summing corners. No reshapes of wide
    # intermediates: Mosaic relayouts of (10,10,E)<->(100,E) were
    # measured at ~7 ms/layer (tools/rpe_ablate.py); this form has none.
    row2 = jax.lax.broadcasted_iota(jnp.int32, (n * n, E), 0)
    rowa = (row2 // n).astype(jnp.float32)             # d-axis lattice idx
    rowb = (row2 % n).astype(jnp.float32)              # h-axis lattice idx
    rownh = jax.lax.broadcasted_iota(jnp.int32, (n * H, E), 0)
    roww = (rownh // H).astype(jnp.float32)            # w-axis lattice idx
    # head-selection matrix S[h, r] = (r % H == h)
    sel_r = jax.lax.broadcasted_iota(jnp.int32, (H, n * H), 1)
    sel_h = jax.lax.broadcasted_iota(jnp.int32, (H, n * H), 0)
    S = (sel_r % H == sel_h).astype(jnp.float32)
    v40 = jnp.zeros((n * H, E), jnp.float32)
    for c in range(8):
        cx = corners_ref[0][:, 3 * c + 0].reshape(TQ, 1)
        cy = corners_ref[0][:, 3 * c + 1].reshape(TQ, 1)
        cz = corners_ref[0][:, 3 * c + 2].reshape(TQ, 1)
        dx = cx - kx                                   # (TQ, TK)
        dy = cy - ky
        dz = cz - kz
        if rotate:
            dx, dy = dx * co - dy * si, dx * si + dy * co
        # component 0 -> last table axis (w), 1 -> h, 2 -> d
        iw = _quantize(dx, log_scale, max_value, n).reshape(1, E)
        ih = _quantize(dy, log_scale, max_value, n).reshape(1, E)
        id_ = _quantize(dz, log_scale, max_value, n).reshape(1, E)
        P = _hat(rowa, id_) * _hat(rowb, ih)
        U = jax.lax.dot_general(
            tables_ref[c], P, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (n*H, E)
        v40 = v40 + U * _hat(roww, iw)
    bias_heads = jax.lax.dot_general(
        S, v40, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # (H, E)
    logits = logits + bias_heads.reshape(HTQ, TK)

    # streaming softmax update, all H*TQ rows at once
    l = jnp.where(kvalid > 0, logits, NEG_INF)         # (HTQ, TK)
    m_old = m_ref[:, :]                                # (HTQ, 1)
    m_new = jnp.maximum(m_old, jnp.max(l, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(l - m_new)                             # (HTQ, TK)
    z_new = z_ref[:, :] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_new = acc_ref[:, :] * alpha + jax.lax.dot_general(
        p, v_tile, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:, :] = m_new
    z_ref[:, :] = z_new
    acc_ref[:, :] = acc_new

    @pl.when(ik == nk - 1)
    def _():
        out_ref[0, 0] = acc_ref[:, :] / jnp.maximum(z_ref[:, :], 1e-30)


def rpe_cross_attention_pallas(q, k, v, corners, angles, key_xyz, tables,
                               key_valid=None, *, log_scale: float,
                               max_value: float, rotate: bool = False,
                               tq: int = 32, tk: Optional[int] = None,
                               interpret: bool = False):
    """Fused kernel entry.

    q: (B, nQ, H, hd) pre-scaled by hd^-0.5; k, v: (B, nK, hd);
    corners: (B, nQ, 8, 3); angles: (B, nQ); key_xyz: (B, nK, 3);
    tables: (8, n, n, n, H); key_valid: (B, nK) or None.
    Returns (B, nQ, H, hd) float32.

    The q tensor is pre-blocked host-side to (B, nQ/tq, H*tq, hd)
    (head-major rows inside each q tile) so every kernel dot runs at
    M = H*tq instead of H small M=tq dots — see _kernel.

    Constraints: nK % tk == 0, nQ % tq == 0. VMEM high-water per tile is
    dominated by the (n^2, tq*tk) weight matrix (~2 MB at the defaults).
    """
    B, nQ, H, hd = q.shape
    nK = k.shape[1]
    n = tables.shape[1]
    TK = tk if tk is not None else min(128, nK)
    tq = min(tq, nQ)
    assert nK % TK == 0, f"nK={nK} must be a multiple of {TK}"
    assert nQ % tq == 0, f"nQ={nQ} must be a multiple of {tq}"
    nqt = nQ // tq

    # (B, nQ, H, hd) -> (B, nQ/tq, H*tq, hd), rows head-major per tile
    q_t = q.reshape(B, nqt, tq, H, hd).transpose(0, 1, 3, 2, 4).reshape(
        B, nqt, H * tq, hd)
    corners_t = corners.reshape(B, nQ, 24)             # (B, nQ, 24)
    cossin = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=2)  # (B,nQ,2)
    kxyz_t = jnp.moveaxis(key_xyz, 1, 2)               # (B, 3, nK)
    if key_valid is None:
        kvalid = jnp.ones((B, 1, nK), jnp.float32)
    else:
        kvalid = key_valid.astype(jnp.float32).reshape(B, 1, nK)
    tables_in = _flatten_tables(tables)                # (8, n^2, n*H)

    grid = (B, nqt, nK // TK)
    kernel = functools.partial(
        _kernel, n=n, H=H, hd=hd, TQ=tq, TK=TK, log_scale=log_scale,
        max_value=max_value, rotate=rotate,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, H * tq, hd),
                         lambda b, iq, ik: (b, iq, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, hd), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, hd), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 24), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 2), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TK), lambda b, iq, ik: (b, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK), lambda b, iq, ik: (b, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n * n, n * H), lambda b, iq, ik: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H * tq, hd),
                               lambda b, iq, ik: (b, iq, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nqt, H * tq, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H * tq, 1), jnp.float32),    # running max
            pltpu.VMEM((H * tq, 1), jnp.float32),    # running denom
            pltpu.VMEM((H * tq, hd), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(q_t, k, v, corners_t, cossin, kxyz_t, kvalid, tables_in)
    # (B, nQ/tq, H*tq, hd) -> (B, nQ, H, hd)
    return out.reshape(B, nqt, H, tq, hd).transpose(0, 1, 3, 2, 4).reshape(
        B, nQ, H, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def rpe_cross_attention(q, k, v, corners, angles, key_xyz, tables,
                        key_valid_f, log_scale, max_value, rotate):
    """Differentiable fused entry: Pallas kernel forward, reference-path
    VJP (the backward recomputes the materialized bias and differentiates
    it — the same cost the rematerialized training path already pays,
    while the forward gets the kernel). key_valid_f: (B, nK) float mask
    (1 = valid); use `jnp.ones` for no masking."""
    return rpe_cross_attention_pallas(
        q, k, v, corners, angles, key_xyz, tables, key_valid_f > 0.5,
        log_scale=log_scale, max_value=max_value, rotate=rotate,
    )


def _rpe_ca_fwd(q, k, v, corners, angles, key_xyz, tables, key_valid_f,
                log_scale, max_value, rotate):
    out = rpe_cross_attention(q, k, v, corners, angles, key_xyz, tables,
                              key_valid_f, log_scale, max_value, rotate)
    return out, (q, k, v, corners, angles, key_xyz, tables, key_valid_f)


def _rpe_ca_bwd(log_scale, max_value, rotate, res, g):
    q, k, v, corners, angles, key_xyz, tables, key_valid_f = res

    def ref(q, k, v, corners, angles, key_xyz, tables, key_valid_f):
        return rpe_cross_attention_reference(
            q, k, v, corners, angles, key_xyz, tables, key_valid_f > 0.5,
            log_scale=log_scale, max_value=max_value, rotate=rotate,
        )

    _, vjp = jax.vjp(ref, q, k, v, corners, angles, key_xyz, tables,
                     key_valid_f)
    return vjp(g)


rpe_cross_attention.defvjp(_rpe_ca_fwd, _rpe_ca_bwd)


def rpe_cross_attention_reference(q, k, v, corners, angles, key_xyz, tables,
                                  key_valid=None, *, log_scale: float,
                                  max_value: float, rotate: bool = False):
    """Pure-jax reference with materialized bias (same math as
    models/transformer.py's scan path); used for parity tests and as the
    non-TPU fallback."""
    from vdetr_tpu.ops.rpe import log_quantize, trilinear_sample_split

    B, nQ, H, hd = q.shape
    attn = jnp.einsum("bqhd,bkd->bhqk", q, k)
    kx = key_xyz[:, None, :, 0]
    ky = key_xyz[:, None, :, 1]
    kz = key_xyz[:, None, :, 2]
    for c in range(8):
        corner = corners[:, :, c, :]
        dx = corner[:, :, 0:1] - kx
        dy = corner[:, :, 1:2] - ky
        dz = corner[:, :, 2:3] - kz
        if rotate:
            co = jnp.cos(angles)[..., None]
            si = jnp.sin(angles)[..., None]
            dx, dy = dx * co - dy * si, dx * si + dy * co
        d0 = log_quantize(dx, log_scale, max_value)
        d1 = log_quantize(dy, log_scale, max_value)
        d2 = log_quantize(dz, log_scale, max_value)
        bias = trilinear_sample_split(tables[c], d0, d1, d2,
                                      heads_first=True)
        attn = attn + bias.transpose(1, 0, 2, 3)
    if key_valid is not None:
        attn = jnp.where(key_valid[:, None, None, :], attn, NEG_INF)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bkd->bqhd", attn, v)
