"""Fused vertex-RPE cross-attention (Pallas TPU kernel).

The V-DETR hotspot (reference models/vdetr_transformer.py:701-758) adds an
8-corner trilinearly-sampled bias to every (query, key) attention logit.
The materialized implementation (models/transformer.py) builds the
(B, H, nQ, nK) bias in HBM once per layer; this kernel never does — per
(q-tile, k-tile) it recomputes corner deltas, log-quantizes them, samples
the VMEM-resident tables, adds the bias to the logits tile and folds it
into a streaming (flash) softmax.

Key Mosaic constraint: the per-head table lookup is a lane-indexed
dynamic gather (`take_along_axis` on the minor axis), which lowers only
when the index array and the operand have identical shapes — so the key
tile width equals the padded table width x heads (H * TPAD lanes), and
every gather returns all H heads at once.

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

TPAD = 1024          # flat table padded length (n^3 = 1000 -> 1024 lanes)
NEG_INF = -1e9


def _quantize(delta, log_scale, max_value, n):
    """log-quantize + continuous table index (align_corners=False), fused:
    reference vdetr_transformer.py:722 + torch grid_sample indexing."""
    q = jnp.sign(delta) * jnp.log2(jnp.abs(delta) * log_scale + 1.0)
    q = q / (np.log2(8.0) * max_value)
    return ((q + 1.0) * n - 1.0) * 0.5


def _flatten_tables(tables):
    """(8, n, n, n, H) -> (8, H*TPAD) flat rows, head-major per corner."""
    C, n, _, _, H = tables.shape
    flat = tables.reshape(C, n ** 3, H)            # (8, n^3, H)
    flat = jnp.moveaxis(flat, -1, 1)               # (8, H, n^3)
    pad = TPAD - n ** 3
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)))
    return flat.reshape(C, H * TPAD)


def _kernel(q_ref, k_ref, v_ref, corners_ref, cossin_ref, kxyz_ref,
            kvalid_ref, tables_ref, out_ref, m_ref, z_ref, acc_ref,
            *, n, H, hd, TQ, TK, log_scale, max_value, rotate):
    """Grid (B, nQ/TQ, nK/TK), k innermost. Scratch m/z/acc persist
    across the k dimension (flash-attention pattern)."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_ref[:, :] = jnp.full((H, TQ), NEG_INF, jnp.float32)
        z_ref[:, :] = jnp.zeros((H, TQ), jnp.float32)
        acc_ref[:, :, :] = jnp.zeros((H, TQ, hd), jnp.float32)

    k_tile = k_ref[0]                      # (TK, hd)
    v_tile = v_ref[0]                      # (TK, hd)
    kvalid = kvalid_ref[0]                 # (1, TK)
    kx = kxyz_ref[0, 0:1, :]               # (1, TK)
    ky = kxyz_ref[0, 1:2, :]
    kz = kxyz_ref[0, 2:3, :]
    if rotate:
        co = cossin_ref[0, 0, :].reshape(TQ, 1)
        si = cossin_ref[0, 1, :].reshape(TQ, 1)

    # per-head logits: q_h (TQ, hd) @ k_tile^T -> (TQ, TK)
    logits = []
    for h in range(H):
        lh = jax.lax.dot_general(
            q_ref[0, h], k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits.append(lh)

    # RPE bias, 8 corners; all-head gathers from the (TQ, H*TPAD) operand
    head_off = jax.lax.broadcasted_iota(
        jnp.int32, (1, H * TK), 1
    ) // TK * TPAD                                     # lane -> head*TPAD
    for c in range(8):
        cx = corners_ref[0, 3 * c + 0, :].reshape(TQ, 1)
        cy = corners_ref[0, 3 * c + 1, :].reshape(TQ, 1)
        cz = corners_ref[0, 3 * c + 2, :].reshape(TQ, 1)
        dx = cx - kx                                   # (TQ, TK)
        dy = cy - ky
        dz = cz - kz
        if rotate:
            dx, dy = dx * co - dy * si, dx * si + dy * co
        # component 0 -> last table axis (w), 1 -> h, 2 -> d
        iw = _quantize(dx, log_scale, max_value, n)
        ih = _quantize(dy, log_scale, max_value, n)
        id_ = _quantize(dz, log_scale, max_value, n)
        fw = jnp.floor(iw)
        fh = jnp.floor(ih)
        fd = jnp.floor(id_)
        ww, wh, wd = iw - fw, ih - fh, id_ - fd
        fw = fw.astype(jnp.int32)
        fh = fh.astype(jnp.int32)
        fd = fd.astype(jnp.int32)

        table_row = tables_ref[c]                      # (1, H*TPAD)
        table_op = jnp.broadcast_to(table_row, (TQ, H * TPAD))
        for dw_ in (0, 1):
            for dh_ in (0, 1):
                for dd_ in (0, 1):
                    cw, ch, cd = fw + dw_, fh + dh_, fd + dd_
                    inb = ((cw >= 0) & (cw < n) & (ch >= 0) & (ch < n)
                           & (cd >= 0) & (cd < n))
                    w = ((ww if dw_ else 1.0 - ww)
                         * (wh if dh_ else 1.0 - wh)
                         * (wd if dd_ else 1.0 - wd)) * inb
                    flat = (jnp.clip(cd, 0, n - 1) * n
                            + jnp.clip(ch, 0, n - 1)) * n \
                        + jnp.clip(cw, 0, n - 1)       # (TQ, TK)
                    # tile indices across heads: lane block h gathers
                    # head-h values (operand lanes == index lanes)
                    idx_all = jnp.tile(flat, (1, H)) + head_off
                    vals = jnp.take_along_axis(table_op, idx_all, axis=1)
                    for h in range(H):
                        logits[h] = logits[h] + (
                            vals[:, h * TK:(h + 1) * TK] * w
                        )

    # streaming softmax update per head
    for h in range(H):
        l = jnp.where(kvalid > 0, logits[h], NEG_INF)
        m_old = m_ref[h].reshape(TQ, 1)
        m_new = jnp.maximum(m_old, jnp.max(l, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(l - m_new)                          # (TQ, TK)
        z_new = z_ref[h].reshape(TQ, 1) * alpha + jnp.sum(
            p, axis=1, keepdims=True
        )
        acc_new = acc_ref[h] * alpha + jax.lax.dot_general(
            p, v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[h] = m_new.reshape(TQ)
        z_ref[h] = z_new.reshape(TQ)
        acc_ref[h] = acc_new

    @pl.when(ik == nk - 1)
    def _():
        for h in range(H):
            z = z_ref[h].reshape(TQ, 1)
            out_ref[0, h] = acc_ref[h] / jnp.maximum(z, 1e-30)


def rpe_cross_attention_pallas(q, k, v, corners, angles, key_xyz, tables,
                               key_valid=None, *, log_scale: float,
                               max_value: float, rotate: bool = False,
                               tq: int = 128, tk: Optional[int] = None,
                               interpret: bool = False):
    """Fused kernel entry.

    q: (B, nQ, H, hd) pre-scaled by hd^-0.5; k, v: (B, nK, hd);
    corners: (B, nQ, 8, 3); angles: (B, nQ); key_xyz: (B, nK, 3);
    tables: (8, n, n, n, H); key_valid: (B, nK) or None.
    Returns (B, nQ, H, hd).

    Constraints (compiled mode): nK % 1024 == 0 (key tile = padded table
    width so the all-head gather lowers), nQ % tq == 0.
    """
    B, nQ, H, hd = q.shape
    nK = k.shape[1]
    n = tables.shape[1]
    if tk is None:
        tk = TPAD if not interpret else min(TPAD, nK)
    TK = tk
    assert interpret or TK == TPAD, (
        "compiled mode requires key tile == padded table width (the "
        "all-head lane gather only lowers with equal index/operand shapes)"
    )
    assert nK % TK == 0, f"nK={nK} must be a multiple of {TK}"
    assert nQ % tq == 0, f"nQ={nQ} must be a multiple of {tq}"

    q_t = jnp.moveaxis(q, 2, 1)                        # (B, H, nQ, hd)
    corners_t = jnp.moveaxis(
        corners.reshape(B, nQ, 24), 1, 2
    )                                                  # (B, 24, nQ)
    cossin = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=1)  # (B,2,nQ)
    kxyz_t = jnp.moveaxis(key_xyz, 1, 2)               # (B, 3, nK)
    if key_valid is None:
        kvalid = jnp.ones((B, 1, nK), jnp.float32)
    else:
        kvalid = key_valid.astype(jnp.float32).reshape(B, 1, nK)
    tables_flat = _flatten_tables(tables)              # (8, H*TPAD)
    # broadcast tables to every batch row is unnecessary: use a 2D spec
    tables_in = tables_flat.reshape(8, 1, H * TPAD)

    grid = (B, nQ // tq, nK // TK)
    kernel = functools.partial(
        _kernel, n=n, H=H, hd=hd, TQ=tq, TK=TK, log_scale=log_scale,
        max_value=max_value, rotate=rotate,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, tq, hd), lambda b, iq, ik: (b, 0, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, hd), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, hd), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, tq), lambda b, iq, ik: (b, 0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tq), lambda b, iq, ik: (b, 0, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TK), lambda b, iq, ik: (b, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK), lambda b, iq, ik: (b, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1, H * TPAD), lambda b, iq, ik: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, tq, hd), lambda b, iq, ik: (b, 0, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, nQ, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, tq), jnp.float32),       # running max
            pltpu.VMEM((H, tq), jnp.float32),       # running denom
            pltpu.VMEM((H, tq, hd), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(q_t, k, v, corners_t, cossin, kxyz_t, kvalid, tables_in)
    return jnp.moveaxis(out, 1, 2)                     # (B, nQ, H, hd)


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
