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
import os
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
    """(8, n, n, n, H) -> (4, n^2, 2*n*H): the PAIRED contraction layout.

    Table axes are (d=z, h=y, w=x, H) (ops/rpe.py sampling convention:
    delta component 0 -> w, 1 -> h, 2 -> d). The kernel contracts over
    the (y, x) axis pair and folds z on the output lanes, because model
    box corners come in 4 (i, i+4) pairs that share lidar (x, y) and
    differ only in z (geometry/boxes.py:74-76 camera sy signs +
    convert_corners_camera2lidar; the roty heading never mixes height).
    Each pair then shares ONE (n^2, E) hat matrix and ONE MXU dot with
    the two corners' tables stacked on the lane axis:

      row (y*n + x), column (j*n*H + z*H + head), j = 0 (corner i) or
      1 (corner i+4).
    """
    C, n, _, _, H = tables.shape
    t = tables.transpose(0, 2, 3, 1, 4).reshape(C, n * n, n * H)
    return jnp.concatenate([t[0:4], t[4:8]], axis=2)


def _unflatten_dtables(dt, n, H):
    """Inverse of _flatten_tables for the table gradient:
    (4, n^2, 2*n*H) -> (8, n, n, n, H)."""
    da = jnp.concatenate([dt[:, :, : n * H], dt[:, :, n * H:]], axis=0)
    return da.reshape(8, n, n, n, H).transpose(0, 3, 1, 2, 4)


def _hat(iota, idx):
    """Linear-interpolation hat weights: relu(1 - |iota - idx|).

    Exactly the two grid_sample taps (floor: 1-frac, floor+1: frac) with
    zero-padding outside the grid — out-of-range taps vanish because no
    integer lattice point is within distance 1."""
    return jnp.maximum(1.0 - jnp.abs(iota - idx), 0.0)


def _tile_iotas(n, H, E):
    """Lattice-index iotas and the head-selection matrix, all built
    directly in their compute layouts (no reshapes)."""
    row2 = jax.lax.broadcasted_iota(jnp.int32, (n * n, E), 0)
    rowa = (row2 // n).astype(jnp.float32)             # y-axis lattice idx
    rowb = (row2 % n).astype(jnp.float32)              # x-axis lattice idx
    rownh = jax.lax.broadcasted_iota(jnp.int32, (n * H, E), 0)
    roww = (rownh // H).astype(jnp.float32)            # z-axis lattice idx
    # head-selection matrix S[h, r] = (r % H == h)
    sel_r = jax.lax.broadcasted_iota(jnp.int32, (H, n * H), 1)
    sel_h = jax.lax.broadcasted_iota(jnp.int32, (H, n * H), 0)
    S = (sel_r % H == sel_h).astype(jnp.float32)
    return rowa, rowb, roww, S


def _pair_tap_fn(corners_ref, cossin_ref, kxyz_ref, *, TQ, E, n,
                 log_scale, max_value, rotate):
    """Returns pair_idx(p) -> (ix, iy, iza, izb) quantized (1, E) table
    indices for corner pair (p, p+4) of the current tile — shared by the
    forward and backward kernels so the recomputed bias taps match
    exactly.

    CONTRACT: corners p and p+4 share x and y (model boxes always do —
    see _flatten_tables); x/y are read from corner p, z from both."""
    kx = kxyz_ref[0, 0:1, :]               # (1, TK)
    ky = kxyz_ref[0, 1:2, :]
    kz = kxyz_ref[0, 2:3, :]
    if rotate:
        co = cossin_ref[0][:, 0].reshape(TQ, 1)
        si = cossin_ref[0][:, 1].reshape(TQ, 1)

    def pair_idx(p):
        cx = corners_ref[0][:, 3 * p + 0].reshape(TQ, 1)
        cy = corners_ref[0][:, 3 * p + 1].reshape(TQ, 1)
        cza = corners_ref[0][:, 3 * p + 2].reshape(TQ, 1)
        czb = corners_ref[0][:, 3 * (p + 4) + 2].reshape(TQ, 1)
        dx = cx - kx                                   # (TQ, TK)
        dy = cy - ky
        if rotate:
            # the z-rotation never mixes z: pair sharing is preserved
            dx, dy = dx * co - dy * si, dx * si + dy * co
        # component 0 (x) -> table w axis, 1 (y) -> h, 2 (z) -> d
        ix = _quantize(dx, log_scale, max_value, n).reshape(1, E)
        iy = _quantize(dy, log_scale, max_value, n).reshape(1, E)
        iza = _quantize(cza - kz, log_scale, max_value, n).reshape(1, E)
        izb = _quantize(czb - kz, log_scale, max_value, n).reshape(1, E)
        return ix, iy, iza, izb

    return pair_idx


def _bias_tile(pair_idx, tables_ref, iotas, n, H):
    """(H*TQ-row-compatible) RPE bias for one tile: returns the (H, E)
    per-head bias (the caller reshapes to (H*TQ, TK)).

    Paired form: ONE (n^2, E) hat-product matrix P and ONE MXU dot per
    corner PAIR (tables stacked to 2*n*H lanes), then per-corner z-hat
    folds on the output halves — half the MXU passes and half the VPU
    hat builds of the per-corner form (tools/layer_micro.py round 4)."""
    rowa, rowb, roww, S = iotas
    E = rowa.shape[1]
    nH = n * H
    v40 = jnp.zeros((nH, E), jnp.float32)
    for p in range(4):
        ix, iy, iza, izb = pair_idx(p)
        P = _hat(rowa, iy) * _hat(rowb, ix)
        U = jax.lax.dot_general(
            tables_ref[p], P, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (2*n*H, E)
        v40 = v40 + U[:nH] * _hat(roww, iza) + U[nH:] * _hat(roww, izb)
    return jax.lax.dot_general(
        S, v40, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # (H, E)


def _dropout_scale(seed_ref, tile_id, shape, rate):
    """Deterministic inverted-dropout scale mask: 0 or 1/(1-rate).

    Seeded by (user seed + flat tile id) so the forward and both backward
    kernels regenerate the identical mask for a tile regardless of their
    grid iteration order. Matches reference attn_drop semantics
    (vdetr_transformer.py:752: dropout on post-softmax probs — applied
    here to unnormalized weights, identical because the softmax
    denominator never sees dropout)."""
    pltpu.prng_seed(seed_ref[0] + tile_id)
    bits = pltpu.prng_random_bits(shape)
    # prng_random_bits returns SIGNED int32 under compiled Mosaic but
    # uint32 under interpret mode; a plain right-shift is arithmetic on
    # the former (negative halves the keep rate — measured drop 0.80 at
    # rate 0.3, tools/dropout_diag.py). Masking the low 23 bits is
    # sign-agnostic and exact in f32 (23 <= mantissa).
    bits = jax.lax.bitcast_convert_type(bits, jnp.int32)
    u = (bits & jnp.int32(0x7FFFFF)).astype(jnp.float32) * (1.0 / (1 << 23))
    return (u >= rate).astype(jnp.float32) * (1.0 / (1.0 - rate))


def _kernel(seed_ref, q_ref, k_ref, v_ref, corners_ref, cossin_ref, kxyz_ref,
            kvalid_ref, tables_ref, out_ref, lse_ref, *refs,
            n, H, hd, TQ, TK, log_scale, max_value, rotate, dropout_rate,
            emit_logits=False):
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
    casts are no-ops, measured bit-identical).

    emit_logits (the TRAIN-path variant, round 5): additionally writes
    the masked biased logits l per tile to an extra output, so the flash
    backward reads them instead of recomputing the whole RPE bias
    (quantize + hat-product P + MXU contractions) a second time —
    _bwd_kernel_a then builds P only for dTables."""
    if emit_logits:
        l_out_ref = refs[0]
        m_ref, z_ref, acc_ref = refs[1:]
    else:
        m_ref, z_ref, acc_ref = refs
    b = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nqt = pl.num_programs(1)
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

    # all-head logits in one dot: (H*TQ, hd) @ (TK, hd)^T -> (H*TQ, TK)
    logits = jax.lax.dot_general(
        q_ref[0, 0], k_tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # RPE bias, 8 corners as 4 xy-sharing PAIRS, gather-free factorized
    # trilinear. Per pair: build the (n^2, E) y/x hat-pair weight matrix
    # P DIRECTLY in its final layout (row r of the n^2 axis decodes to
    # (r//n, r%n); the two grid_sample taps per axis are exactly
    # relu(1 - |lattice - index|)), one MXU contraction with the
    # (n^2, 2*n*H) stacked pair table, then multiply each output half by
    # its corner's z-axis hat expanded to (n*H, E) — again built
    # in-layout from a row//H iota. The z/head fold is ONE tiny constant
    # selection matmul (H, n*H) @ (n*H, E) AFTER summing pairs. No
    # reshapes of wide intermediates: Mosaic relayouts of
    # (10,10,E)<->(100,E) were measured at ~7 ms/layer
    # (tools/rpe_ablate.py); this form has none.
    pair_idx = _pair_tap_fn(corners_ref, cossin_ref, kxyz_ref, TQ=TQ,
                            E=E, n=n, log_scale=log_scale,
                            max_value=max_value, rotate=rotate)
    iotas = _tile_iotas(n, H, E)
    bias_heads = _bias_tile(pair_idx, tables_ref, iotas, n, H)
    logits = logits + bias_heads.reshape(HTQ, TK)

    # streaming softmax update, all H*TQ rows at once
    l = jnp.where(kvalid > 0, logits, NEG_INF)         # (HTQ, TK)
    if emit_logits:
        l_out_ref[0, 0] = l
    m_old = m_ref[:, :]                                # (HTQ, 1)
    m_new = jnp.maximum(m_old, jnp.max(l, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(l - m_new)                             # (HTQ, TK)
    # dropout scales the numerator only; the denominator z never sees it
    # (== post-softmax dropout, reference vdetr_transformer.py:752)
    if dropout_rate > 0.0:
        g = _dropout_scale(seed_ref, (b * nqt + iq) * nk + ik,
                           (HTQ, TK), dropout_rate)
        pv = p * g
    else:
        pv = p
    z_new = z_ref[:, :] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_new = acc_ref[:, :] * alpha + jax.lax.dot_general(
        pv, v_tile, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:, :] = m_new
    z_ref[:, :] = z_new
    acc_ref[:, :] = acc_new

    @pl.when(ik == nk - 1)
    def _():
        z = z_ref[:, :]
        out_ref[0, 0] = acc_ref[:, :] / jnp.maximum(z, 1e-30)
        # logsumexp for the flash backward; 0 for fully-masked rows so
        # exp(l - lse) stays 0 instead of NaN
        lse_ref[0, 0] = jnp.where(
            z > 0, m_ref[:, :] + jnp.log(jnp.maximum(z, 1e-30)), 0.0)


def _block_q(x, B, nqt, tq, H, hd):
    """(B, nQ, H, hd) -> (B, nQ/tq, H*tq, hd), rows head-major per tile."""
    return x.reshape(B, nqt, tq, H, hd).transpose(0, 1, 3, 2, 4).reshape(
        B, nqt, H * tq, hd)


def _unblock_q(x, B, nqt, tq, H, hd):
    """Inverse of _block_q."""
    return x.reshape(B, nqt, H, tq, hd).transpose(0, 1, 3, 2, 4).reshape(
        B, nqt * tq, H, hd)


def _prep_inputs(q, k, corners, angles, key_xyz, key_valid, tables, tq, tk):
    """Shared host-side input massaging for the forward/backward kernels."""
    B, nQ, H, hd = q.shape
    nK = k.shape[1]
    TK = tk if tk is not None else min(128, nK)
    tq = min(tq, nQ)
    assert nK % TK == 0, f"nK={nK} must be a multiple of {TK}"
    assert nQ % tq == 0, f"nQ={nQ} must be a multiple of {tq}"
    nqt = nQ // tq
    q_t = _block_q(q, B, nqt, tq, H, hd)
    corners_t = corners.reshape(B, nQ, 24)
    cossin = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=2)
    kxyz_t = jnp.moveaxis(key_xyz, 1, 2)               # (B, 3, nK)
    if key_valid is None:
        kvalid = jnp.ones((B, 1, nK), jnp.float32)
    else:
        kvalid = key_valid.astype(jnp.float32).reshape(B, 1, nK)
    tables_in = _flatten_tables(tables)                # (4, n^2, 2*n*H)
    return q_t, corners_t, cossin, kxyz_t, kvalid, tables_in, TK, tq, nqt


def corner_pair_contract_error(corners):
    """Max |x/y mismatch| between corners i and i+4 (ADVICE r4: the
    fused kernels read the pair's x/y from corner i and only z from
    corner i+4; any caller passing general corners gets a silently
    wrong bias). Returns a scalar; 0 for every box-derived corner set.
    Checked eagerly on concrete inputs when VDETR_VALIDATE_CORNERS=1,
    and by the reference-parity test harness."""
    c = jnp.asarray(corners)
    return jnp.abs(c[..., :4, :2] - c[..., 4:, :2]).max()


def _maybe_validate_corners(corners):
    if os.environ.get("VDETR_VALIDATE_CORNERS") != "1":
        return
    if isinstance(corners, jax.core.Tracer):
        return  # cannot inspect values under trace; use the test harness
    err = float(corner_pair_contract_error(corners))
    if err > 1e-3:
        raise ValueError(
            f"corner-pair contract violated: max |xy(c_i) - xy(c_i+4)| = "
            f"{err:.2e} (fused RPE kernels require corners i and i+4 to "
            f"share x/y; see rpe_cross_attention_pallas docstring)")


def rpe_cross_attention_pallas(q, k, v, corners, angles, key_xyz, tables,
                               key_valid=None, *, log_scale: float,
                               max_value: float, rotate: bool = False,
                               tq: int = 32, tk: Optional[int] = None,
                               dropout_rate: float = 0.0, seed=None,
                               return_lse: bool = False,
                               return_logits: bool = False,
                               interpret: bool = False):
    """Fused kernel entry.

    q: (B, nQ, H, hd) pre-scaled by hd^-0.5; k, v: (B, nK, hd);
    corners: (B, nQ, 8, 3); angles: (B, nQ); key_xyz: (B, nK, 3);
    tables: (8, n, n, n, H); key_valid: (B, nK) or None.

    CORNER-PAIR CONTRACT: corners i and i+4 must share x and y (the
    kernel reads the pair's x/y from corner i and only z from corner
    i+4). Every box-derived corner set satisfies this: the camera-frame
    sy sign pattern [1,1,1,1,-1,-1,-1,-1] (geometry/boxes.py:75) puts
    the height axis — lidar z after convert_corners_camera2lidar — on
    exactly the (i, i+4) split, and neither the roty heading nor the
    in-kernel object-frame rotation mixes it.
    dropout_rate/seed: deterministic in-kernel attention dropout
    (reference attn_drop); seed is an int32 scalar array.
    Returns (B, nQ, H, hd) float32 (plus blocked (B, nQ/tq, H*tq, 1)
    logsumexp when return_lse).

    The q tensor is pre-blocked host-side to (B, nQ/tq, H*tq, hd)
    (head-major rows inside each q tile) so every kernel dot runs at
    M = H*tq instead of H small M=tq dots — see _kernel.

    Constraints: nK % tk == 0, nQ % tq == 0. VMEM high-water per tile is
    dominated by the (n^2, tq*tk) weight matrix (~2 MB at the defaults).
    """
    _maybe_validate_corners(corners)
    B, nQ, H, hd = q.shape
    nK = k.shape[1]
    n = tables.shape[1]
    (q_t, corners_t, cossin, kxyz_t, kvalid, tables_in, TK, tq,
     nqt) = _prep_inputs(q, k, corners, angles, key_xyz, key_valid, tables,
                         tq, tk)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)

    grid = (B, nqt, nK // TK)
    kernel = functools.partial(
        _kernel, n=n, H=H, hd=hd, TQ=tq, TK=TK, log_scale=log_scale,
        max_value=max_value, rotate=rotate, dropout_rate=dropout_rate,
        emit_logits=return_logits,
    )
    out_specs = [
        pl.BlockSpec((1, 1, H * tq, hd),
                     lambda b, iq, ik, *_: (b, iq, 0, 0)),
        pl.BlockSpec((1, 1, H * tq, 1),
                     lambda b, iq, ik, *_: (b, iq, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, nqt, H * tq, hd), jnp.float32),
        jax.ShapeDtypeStruct((B, nqt, H * tq, 1), jnp.float32),
    ]
    if return_logits:
        out_specs.append(pl.BlockSpec((1, 1, H * tq, TK),
                                      lambda b, iq, ik, *_: (b, iq, 0, ik)))
        out_shape.append(
            jax.ShapeDtypeStruct((B, nqt, H * tq, nK), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, H * tq, hd),
                         lambda b, iq, ik, *_: (b, iq, 0, 0)),
            pl.BlockSpec((1, TK, hd), lambda b, iq, ik, *_: (b, ik, 0)),
            pl.BlockSpec((1, TK, hd), lambda b, iq, ik, *_: (b, ik, 0)),
            pl.BlockSpec((1, tq, 24), lambda b, iq, ik, *_: (b, iq, 0)),
            pl.BlockSpec((1, tq, 2), lambda b, iq, ik, *_: (b, iq, 0)),
            pl.BlockSpec((1, 3, TK), lambda b, iq, ik, *_: (b, 0, ik)),
            pl.BlockSpec((1, 1, TK), lambda b, iq, ik, *_: (b, 0, ik)),
            pl.BlockSpec((4, n * n, 2 * n * H),
                         lambda b, iq, ik, *_: (0, 0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((H * tq, 1), jnp.float32),    # running max
            pltpu.VMEM((H * tq, 1), jnp.float32),    # running denom
            pltpu.VMEM((H * tq, hd), jnp.float32),   # output accumulator
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, q_t, k, v, corners_t, cossin, kxyz_t, kvalid, tables_in)
    out = _unblock_q(res[0], B, nqt, tq, H, hd)
    if return_logits:
        return out, res[1], res[2]
    if return_lse:
        return out, res[1]
    return out


def _bwd_kernel_a(seed_ref, l_ref, k_ref, v_ref, corners_ref, cossin_ref,
                  kxyz_ref, do_ref, lse_ref, dd_ref,
                  dq_ref, dt_ref, ds_ref, eg_ref, dq_acc,
                  *, n, H, hd, TQ, TK, log_scale, max_value, rotate,
                  dropout_rate):
    """Flash backward, ZERO bias recomputes (round 5): the train forward
    materializes the masked biased logits l per tile (emit_logits), so
    the probs are just e = exp(l - lse) — no QK^T matmul, no quantize,
    no bias rebuild. The hat-product P matrices are built exactly ONCE
    per pair here, for dTables only (the pre-round-5 kernel built the
    bias for e and then built P again for dTables). dQ accumulates over
    k tiles (grid k-inner); dTables accumulates in a VMEM-resident
    constant output block across the whole grid (the TPU grid is
    sequential); the materialized dlogits (ds) and dropout-scaled probs
    (eg) tiles make dK/dV two plain XLA matmuls outside the kernel —
    that 2x(B, H*nQ, nK) f32 HBM round-trip costs only ~0.3 ms at
    100k-point size (the stored l adds one more, same scaling).

    Gradient notation: e = normalized probs, g = dropout scale, O/dO the
    forward output and its cotangent, D = rowsum(dO * O). Then
    dlogits = e * (g * (dO @ V^T) - D), dQ = dlogits @ K,
    dBias = dlogits, dTables_pair = P_p @ [dv40*hat_z_a; dv40*hat_z_b]^T.
    Corner/angle/key_xyz gradients are NOT produced: the decoder feeds
    stop-gradient boxes (models/transformer.py:539-545,568-573)."""
    b = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nqt = pl.num_programs(1)
    nk = pl.num_programs(2)
    HTQ = H * TQ

    @pl.when(ik == 0)
    def _():
        dq_acc[:, :] = jnp.zeros((HTQ, hd), jnp.float32)

    @pl.when((b == 0) & (iq == 0) & (ik == 0))
    def _():
        dt_ref[:, :, :] = jnp.zeros(dt_ref.shape, dt_ref.dtype)

    k_tile = k_ref[0]
    v_tile = v_ref[0]
    do_tile = do_ref[0, 0]                             # (HTQ, hd)
    lse = lse_ref[0, 0]                                # (HTQ, 1)
    dd = dd_ref[0, 0]                                  # (HTQ, 1)
    # masked logits stored by the forward: exp(NEG_INF - lse) == 0, so
    # invalid keys and fully-masked rows (lse forced to 0) contribute 0
    e = jnp.exp(l_ref[0, 0] - lse)                     # (HTQ, TK)
    if dropout_rate > 0.0:
        g = _dropout_scale(seed_ref, (b * nqt + iq) * nk + ik,
                           (HTQ, TK), dropout_rate)
    else:
        g = None
    dp = jax.lax.dot_general(
        do_tile, v_tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # (HTQ, TK)
    if g is not None:
        dp = dp * g
    ds = e * (dp - dd)                                 # (HTQ, TK)
    ds_ref[0, 0] = ds
    eg_ref[0, 0] = e if g is None else e * g
    dq_acc[:, :] = dq_acc[:, :] + jax.lax.dot_general(
        ds, k_tile, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dTables: dv40 = S^T @ dBias_heads; per pair dU = the two z-hat
    # folds stacked on sublanes, dT_p += P_p @ dU^T (contract over E)
    E = TQ * TK
    pair_idx = _pair_tap_fn(corners_ref, cossin_ref, kxyz_ref, TQ=TQ,
                            E=E, n=n, log_scale=log_scale,
                            max_value=max_value, rotate=rotate)
    rowa, rowb, roww, S = _tile_iotas(n, H, E)
    nH = n * H
    dbias = ds.reshape(H, E)
    dv40 = jax.lax.dot_general(
        S, dbias, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # (n*H, E)
    for p in range(4):
        ix, iy, iza, izb = pair_idx(p)
        P = _hat(rowa, iy) * _hat(rowb, ix)            # (n^2, E)
        dU = jnp.concatenate(
            [dv40 * _hat(roww, iza), dv40 * _hat(roww, izb)], axis=0
        )                                              # (2*n*H, E)
        dt_ref[p] = dt_ref[p] + jax.lax.dot_general(
            P, dU, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (n^2, 2*n*H)

    @pl.when(ik == nk - 1)
    def _():
        dq_ref[0, 0] = dq_acc[:, :]


def _flash_fwd_impl(q, k, v, corners, angles, key_xyz, tables, key_valid_f,
                    seed, log_scale, max_value, rotate, dropout_rate,
                    return_logits=False):
    return rpe_cross_attention_pallas(
        q, k, v, corners, angles, key_xyz, tables, key_valid_f > 0.5,
        log_scale=log_scale, max_value=max_value, rotate=rotate,
        dropout_rate=dropout_rate, seed=seed, return_lse=True,
        return_logits=return_logits,
    )


def _flash_bwd_impl(q, k, v, corners, angles, key_xyz, tables, key_valid_f,
                    seed, out, lse, logits_t, g_out, log_scale, max_value,
                    rotate, dropout_rate, tq=32, tk=None, interpret=False):
    """Launch the backward kernel; returns (dq, dk, dv, dtables).

    logits_t: the blocked (B, nqt, H*tq, nK) masked biased logits the
    TRAIN forward materialized (emit_logits) — the backward reads them
    instead of recomputing the RPE bias. One Pallas pass produces
    dQ/dTables and materializes ds (dlogits) and eg (dropout-scaled
    probs); dK = ds^T @ Q and dV = eg^T @ dO are ordinary XLA batched
    matmuls (see _bwd_kernel_a docstring for the trade)."""
    B, nQ, H, hd = q.shape
    nK = k.shape[1]
    n = tables.shape[1]
    (q_t, corners_t, cossin, kxyz_t, kvalid, tables_in, TK, tq,
     nqt) = _prep_inputs(q, k, corners, angles, key_xyz, key_valid_f > 0.5,
                         tables, tq, tk)
    del q_t, kvalid, tables_in  # bias is not recomputed in backward
    seed = jnp.zeros((1,), jnp.int32) if seed is None else (
        jnp.asarray(seed, jnp.int32).reshape(1))
    do_t = _block_q(g_out, B, nqt, tq, H, hd)
    # D = rowsum(dO * O) per (head, query) row, in blocked layout
    dd = jnp.sum(_block_q(out, B, nqt, tq, H, hd) * do_t, axis=-1,
                 keepdims=True)                        # (B, nqt, HTQ, 1)
    nkt = nK // TK
    common = dict(n=n, H=H, hd=hd, TQ=tq, TK=TK, log_scale=log_scale,
                  max_value=max_value, rotate=rotate,
                  dropout_rate=dropout_rate)
    qspec = pl.BlockSpec((1, 1, H * tq, hd), lambda b, i, j, *_: (b, i, 0, 0))
    aux = pl.BlockSpec((1, 1, H * tq, 1), lambda b, i, j, *_: (b, i, 0, 0))
    kspec = pl.BlockSpec((1, TK, hd), lambda b, i, j, *_: (b, j, 0))
    cspec = pl.BlockSpec((1, tq, 24), lambda b, i, j, *_: (b, i, 0))
    aspec = pl.BlockSpec((1, tq, 2), lambda b, i, j, *_: (b, i, 0))
    xspec = pl.BlockSpec((1, 3, TK), lambda b, i, j, *_: (b, 0, j))
    tspec = pl.BlockSpec((4, n * n, 2 * n * H),
                         lambda b, i, j, *_: (0, 0, 0))
    pspec = pl.BlockSpec((1, 1, H * tq, TK), lambda b, i, j, *_: (b, i, 0, j))

    dq_t, dtab, ds_t, eg_t = pl.pallas_call(
        functools.partial(_bwd_kernel_a, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nqt, nkt),
            in_specs=[pspec, kspec, kspec, cspec, aspec, xspec,
                      qspec, aux, aux],
            out_specs=[qspec, tspec, pspec, pspec],
            scratch_shapes=[pltpu.VMEM((H * tq, hd), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, nqt, H * tq, hd), jnp.float32),
            jax.ShapeDtypeStruct((4, n * n, 2 * n * H), jnp.float32),
            jax.ShapeDtypeStruct((B, nqt, H * tq, nK), jnp.float32),
            jax.ShapeDtypeStruct((B, nqt, H * tq, nK), jnp.float32),
        ],
        interpret=interpret,
    )(seed, logits_t, k, v, corners_t, cossin, kxyz_t,
      do_t, lse, dd)

    dq = _unblock_q(dq_t, B, nqt, tq, H, hd)
    dtables = _unflatten_dtables(dtab, n, H)
    # (B, nqt, H, tq, nK) -> (B, H*nQ rows q-major within head, nK)
    def _rows(x):
        return x.reshape(B, nqt, H, tq, nK).transpose(0, 2, 1, 3, 4) \
                .reshape(B, H, nQ, nK)

    ds_r = _rows(ds_t)
    eg_r = _rows(eg_t)
    dk = jnp.einsum("bhqk,bqhd->bkd", ds_r, q,
                    preferred_element_type=jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkd", eg_r, g_out,
                    preferred_element_type=jnp.float32)
    return dq, dk, dv, dtables


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def rpe_cross_attention_flash(q, k, v, corners, angles, key_xyz, tables,
                              key_valid_f, seed, log_scale, max_value,
                              rotate, dropout_rate):
    """Fully-fused differentiable RPE cross-attention: Pallas flash
    forward AND backward (dQ/dK/dV/dTables), with deterministic in-kernel
    attention dropout.

    IMPORTANT: corners/angles/key_xyz/key_valid receive ZERO gradients —
    the decoder refines boxes against stop-gradient priors
    (models/transformer.py:539-545,568-573, mirroring reference
    vdetr_transformer.py detached-prior refinement) and key_xyz is the
    non-differentiable voxel lattice. Do not use this entry if gradient
    flow through box corners is required; use rpe_cross_attention
    (reference-path VJP) instead.

    CORNER-PAIR CONTRACT (see rpe_cross_attention_pallas): corners i
    and i+4 must share x/y — holds for every box-derived corner set;
    validate with corner_pair_contract_error for anything else.

    seed: int32 scalar array; vary per step for fresh dropout masks.
    """
    out, _ = _flash_fwd_impl(q, k, v, corners, angles, key_xyz, tables,
                             key_valid_f, seed, log_scale, max_value,
                             rotate, dropout_rate)
    return out


def _flash_vjp_fwd(q, k, v, corners, angles, key_xyz, tables, key_valid_f,
                   seed, log_scale, max_value, rotate, dropout_rate):
    # the train-path forward also materializes the masked biased logits
    # ((B, nQ/tq, H*tq, nK) f32 — one more HBM tensor at the ds/eg
    # scaling, ~64 MB/layer at the published B=1 size) so the backward
    # skips the entire bias recompute
    out, lse, logits_t = _flash_fwd_impl(
        q, k, v, corners, angles, key_xyz, tables, key_valid_f, seed,
        log_scale, max_value, rotate, dropout_rate, return_logits=True)
    return out, (q, k, v, corners, angles, key_xyz, tables, key_valid_f,
                 seed, out, lse, logits_t)


def _flash_vjp_bwd(log_scale, max_value, rotate, dropout_rate, res, g_out):
    (q, k, v, corners, angles, key_xyz, tables, key_valid_f, seed, out,
     lse, logits_t) = res
    dq, dk, dv, dtables = _flash_bwd_impl(
        q, k, v, corners, angles, key_xyz, tables, key_valid_f, seed, out,
        lse, logits_t, g_out, log_scale, max_value, rotate, dropout_rate)
    zero_seed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dq, dk, dv, jnp.zeros_like(corners), jnp.zeros_like(angles),
            jnp.zeros_like(key_xyz), dtables, jnp.zeros_like(key_valid_f),
            zero_seed)


rpe_cross_attention_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def rpe_cross_attention(q, k, v, corners, angles, key_xyz, tables,
                        key_valid_f, log_scale, max_value, rotate):
    """Differentiable fused entry: Pallas kernel forward, reference-path
    VJP (the backward recomputes the materialized bias and differentiates
    it — the same cost the rematerialized training path already pays,
    while the forward gets the kernel). key_valid_f: (B, nK) float mask
    (1 = valid); use `jnp.ones` for no masking.

    CORNER-PAIR CONTRACT (see rpe_cross_attention_pallas): corners i
    and i+4 must share x/y — holds for every box-derived corner set;
    validate with corner_pair_contract_error for anything else."""
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
