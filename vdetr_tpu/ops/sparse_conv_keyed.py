"""Keyed (map-free) windowed Mosaic sparse convolution.

The round-3 window conv kernel (ops/sparse_conv_kernel.py) consumes a
precomputed kernel MAP (27, V) plus window-local indices `le` — and the
map build (windowed map kernel / z-run double-sorts, ops/map_kernel.py)
is the single largest block of the eval forward (ROUND3_NOTES.md: the
backbone's ~150 ms is dominated by map builds + voxel machinery, not
the conv gathers).

This kernel removes the map entirely: the one-hot row-selection matrix
is built IN-KERNEL by integer compare of the (VMEM-resident) sorted key
table windows against the tile's shifted query keys — the same compare
the map kernel runs, but its result feeds the MXU contraction directly
instead of being materialized as a (27, V) map:

    s[v + e*T, l] = (win_key[l] == qkey[v] + c_g + (e-1)) & valid_bit
    x = s @ win_feats;  out += x_e @ W[g*3+e]

Per conv this costs the same in-kernel compare work the `le`-based
kernel already paid (iota vs key compare — identical shapes), so
dropping the map build is pure profit. Reference semantics unchanged:
MinkowskiEngine submanifold / strided convolution kernel maps
(models/mink_resnet.py via ME's coordinate manager).

Exactness: identical contract to the mapped kernel. Window anchors come
from `map_kernel.build_anchors` (rank lookups over 18*nt values); rows
whose match could live in the uncovered rank gap between the two window
pairs are detected EXACTLY in XLA (`detect_bad_rows` replicates the
kernel's gap predicate) and patched by a compacted z-run lookup
(`build_fix_plan`); past the budget the caller falls back to the XLA
gather path whose map is built lazily inside the untaken-branch cond.

Backward (submanifold): input sites == output sites means the transpose
conv is the SAME keyed kernel with flipped+transposed weights and the
SAME anchors (the stencil offset set is symmetric and the queries are
the table's own keys, so per-(tile, group) window positions coincide);
bad rows are the same set, and the fix-up mirror overwrites dFeats at
those rows with the exact gather transpose conv — the structure
established for the mapped kernel after the round-3 advisor finding.
dW accumulates X^T dOut in VMEM scratch exactly as before.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdetr_tpu.ops.map_kernel import (
    _BIGQ,
    _group_shifts,
    _group_valid,
    build_anchors,
    offset_validity_mask,
)
from vdetr_tpu.ops.voxelize import KEY_SENTINEL, pack_keys

_GROUPS = 9
_W = 3
_PAIRS = 2
_NW = 2 * _PAIRS  # window blocks per (tile, group): [bA, bA+1, bB, bB+1]


# ---------------------------------------------------------------------------
# XLA-side geometry: anchors, bad-row detection, fix-up plan
# ---------------------------------------------------------------------------

def conv_window_geometry(in_keys, q0, qvalid, extent, tile: int, wb: int):
    """Per-sample window geometry for a keyed conv.

    in_keys: (V_in,) sorted table keys; q0: (V, 3) integer query centers
    in the TABLE's lattice units (own coords for submanifold,
    2*out_coords for stride-2); qvalid: (V,).

    Returns dict with:
      qkeym: (V,) shifted-safe query keys (_BIGQ at invalid rows)
      mask:  (V,) 27-bit offset validity
      blk:   (nt*18,) flat window anchors (map_kernel.build_anchors)
      bad:   (V,) rows the windows cannot decide (exact gap predicate)
    """
    v_in = in_keys.shape[0]
    qkey = pack_keys(q0, extent)
    qv = qvalid & (qkey != KEY_SENTINEL)
    qkeym = jnp.where(qv, qkey, _BIGQ)
    mask = offset_validity_mask(q0, qv, extent)
    blk = build_anchors(in_keys, qkeym, _group_valid(mask), extent,
                        v_in, tile, wb)
    bad = detect_bad_rows(in_keys, qkeym, mask, blk, extent, tile, wb)
    return {"qkeym": qkeym, "mask": mask, "blk": blk, "bad": bad}


def detect_bad_rows(in_keys, qkeym, mask, blk, extent, tile: int, wb: int):
    """(V,) bool — EXACT replica of the window kernel's gap predicate
    (map_kernel._make_map_kernel): a query q_e = qkey + c_g + (e-1) is
    undecidable iff the pairs are non-contiguous (bB > bA + 2) and q_e
    lies strictly between window A's last key and window B's first key.
    """
    v_in = in_keys.shape[0]
    V = qkeym.shape[0]
    nt = V // tile
    keys_p = jnp.concatenate(
        [in_keys, jnp.full((4 * wb,), KEY_SENTINEL, jnp.int32)])
    ab = blk.reshape(nt, _GROUPS, _PAIRS)
    bA = ab[:, :, 0]
    bB = ab[:, :, 1]                                   # (nt, 9)
    amax = keys_p[(bA + 2) * wb - 1]                   # (nt, 9)
    bmin = keys_p[bB * wb]
    gap = bB > bA + 2
    shifts = jnp.asarray(_group_shifts(extent), jnp.int32)
    qt = qkeym.reshape(nt, tile)
    bad = jnp.zeros((nt, tile), bool)
    for g in range(_GROUPS):
        q = qt + shifts[g]                             # (nt, tile)
        for e in range(_W):
            vb = ((mask.reshape(nt, tile) >> (g * _W + e)) & 1) > 0
            qe = q + (e - 1)
            bad = bad | (vb & gap[:, g:g + 1]
                         & (qe > amax[:, g:g + 1])
                         & (qe < bmin[:, g:g + 1]))
    return bad.reshape(V)


def build_fix_plan(in_keys, bad, q0, qvalid, extent, budget: int):
    """Compacted exact fix-up for bad rows (row granularity).

    Returns (rows (budget,), fix_nbr (27, budget), overflow ()): rows is
    V for unused slots; fix_nbr points at the miss row (v_in) there.
    Exact via the z-run compacted lookup (sparse_conv._zrun_neighbors).
    """
    from vdetr_tpu.ops.sparse_conv import _zrun_neighbors

    V = bad.shape[0]
    v_in = in_keys.shape[0]
    order = jnp.where(bad, jnp.arange(V, dtype=jnp.int32), jnp.int32(V))
    rows = jnp.sort(order)[:budget]
    used = rows < V
    safe = jnp.clip(rows, 0, V - 1)
    fq0 = jnp.take(q0, safe, axis=0)
    fvalid = used & jnp.take(qvalid, safe)
    fix_nbr = _zrun_neighbors(in_keys, fq0, fvalid, extent, 1)
    fix_nbr = jnp.where(used[None, :], fix_nbr, v_in)
    overflow = bad.sum() > budget
    return rows, fix_nbr, overflow


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _keyed_conv_kernel(sh_ref, tab_ref, qk_ref, mask_ref, w_ref, *refs):
    """Grid (B, nt). refs = 36 feature-window refs then out_ref.

    sh_ref SMEM (B, 9 + nt*18): group shifts ++ flat anchors; tab_ref
    (1, rows, wb) the ENTIRE padded key table (VMEM-resident; 65k keys =
    256 KB); qk/mask (1, 1, T); w_ref (27, C, Co) bf16; feature windows
    (1, wb, C); out (1, T, Co) f32.
    """
    wins = refs[:_NW * _GROUPS]
    out_ref = refs[_NW * _GROUPS]
    b = pl.program_id(0)
    t = pl.program_id(1)
    stride = _GROUPS * _PAIRS
    T = qk_ref.shape[2]
    Co = w_ref.shape[2]
    wb = wins[0].shape[1]

    qk = qk_ref[0, 0, :][:, None]          # (T, 1)
    mask = mask_ref[0, 0, :][:, None]      # (T, 1)
    acc = jnp.zeros((T, Co), jnp.float32)
    for g in range(_GROUPS):
        bA = sh_ref[b, 9 + t * stride + g * _PAIRS]
        bB = sh_ref[b, 9 + t * stride + g * _PAIRS + 1]
        q = qk + sh_ref[b, g]              # (T, 1)
        rows = [tab_ref[0, pl.ds(bA, 1), :], tab_ref[0, pl.ds(bA + 1, 1), :],
                tab_ref[0, pl.ds(bB, 1), :], tab_ref[0, pl.ds(bB + 1, 1), :]]
        win = jnp.concatenate(
            [wins[_NW * g + j][0] for j in range(_NW)], axis=0
        ).astype(jnp.bfloat16)             # (4wb, C)
        parts = []
        for e in range(_W):
            vb = ((mask >> (g * _W + e)) & 1) > 0        # (T, 1)
            qe = q + (e - 1)
            s_e = jnp.concatenate(
                [(row == qe) for row in rows], axis=1)   # (T, 4wb)
            parts.append(s_e & vb)
        s = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)  # (3T, 4wb)
        x = jax.lax.dot_general(
            s, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)             # (3T, C)
        for e in range(_W):
            acc = acc + jax.lax.dot_general(
                x[e * T:(e + 1) * T], w_ref[g * _W + e],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc


def _keyed_dw_kernel(sh_ref, tab_ref, qk_ref, mask_ref, dout_ref, *refs):
    """Grid (B, nt). refs = 36 feature-window refs then dw_ref
    (27, C, Co) f32 — revisited every grid step (constant index map) so
    the accumulator lives in VMEM for the whole pass."""
    wins = refs[:_NW * _GROUPS]
    dw_ref = refs[_NW * _GROUPS]
    b = pl.program_id(0)
    t = pl.program_id(1)
    stride = _GROUPS * _PAIRS
    T = qk_ref.shape[2]
    wb = wins[0].shape[1]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    qk = qk_ref[0, 0, :][:, None]
    mask = mask_ref[0, 0, :][:, None]
    dout = dout_ref[0].astype(jnp.bfloat16)  # (T, Co)
    for g in range(_GROUPS):
        bA = sh_ref[b, 9 + t * stride + g * _PAIRS]
        bB = sh_ref[b, 9 + t * stride + g * _PAIRS + 1]
        q = qk + sh_ref[b, g]
        rows = [tab_ref[0, pl.ds(bA, 1), :], tab_ref[0, pl.ds(bA + 1, 1), :],
                tab_ref[0, pl.ds(bB, 1), :], tab_ref[0, pl.ds(bB + 1, 1), :]]
        win = jnp.concatenate(
            [wins[_NW * g + j][0] for j in range(_NW)], axis=0
        ).astype(jnp.bfloat16)
        parts = []
        for e in range(_W):
            vb = ((mask >> (g * _W + e)) & 1) > 0
            qe = q + (e - 1)
            s_e = jnp.concatenate(
                [(row == qe) for row in rows], axis=1)
            parts.append(s_e & vb)
        s = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
        x = jax.lax.dot_general(
            s, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        for e in range(_W):
            dw_ref[g * _W + e] += jax.lax.dot_general(
                x[e * T:(e + 1) * T], dout, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _keyed_dw_kernel_g(sh_ref, tab_ref, qk_ref, mask_ref, dout_ref, *refs):
    """Group-split weight gradient: grid (9, B, nt), one offset GROUP per
    outer step. The dw block is (3, C, Co) — 3 MB f32 at 512x512 vs the
    28 MB full-tensor scratch — revisited contiguously over the inner
    (B, nt) sweep so accumulation stays in VMEM per group. Window refs
    are the 4 blocks of THIS group only (index maps take the g grid
    index); total window DMA across the grid equals the fused kernel's
    36-per-(b,t)."""
    wins = refs[:_NW]
    dw_ref = refs[_NW]
    g = pl.program_id(0)
    b = pl.program_id(1)
    t = pl.program_id(2)
    stride = _GROUPS * _PAIRS
    T = qk_ref.shape[2]
    first = (b == 0) & (t == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    qk = qk_ref[0, 0, :][:, None]
    mask = mask_ref[0, 0, :][:, None]
    dout = dout_ref[0].astype(jnp.bfloat16)
    bA = sh_ref[b, 9 + t * stride + g * _PAIRS]
    bB = sh_ref[b, 9 + t * stride + g * _PAIRS + 1]
    q = qk + sh_ref[b, g]
    rows = [tab_ref[0, pl.ds(bA, 1), :], tab_ref[0, pl.ds(bA + 1, 1), :],
            tab_ref[0, pl.ds(bB, 1), :], tab_ref[0, pl.ds(bB + 1, 1), :]]
    win = jnp.concatenate(
        [wins[j][0] for j in range(_NW)], axis=0
    ).astype(jnp.bfloat16)
    parts = []
    for e in range(_W):
        vb = ((mask >> (g * _W + e)) & 1) > 0
        qe = q + (e - 1)
        s_e = jnp.concatenate(
            [(row == qe) for row in rows], axis=1)
        parts.append(s_e & vb)
    s = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
    x = jax.lax.dot_general(
        s, win, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    for e in range(_W):
        dw_ref[e] += jax.lax.dot_general(
            x[e * T:(e + 1) * T], dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _win_index_map(g, pair, off):
    stride = _GROUPS * _PAIRS

    def index_map(bi, t, sh_s):
        return (bi, sh_s[bi, 9 + t * stride + g * _PAIRS + pair] + off, 0)
    return index_map


def _win_index_map_g(pair, off):
    stride = _GROUPS * _PAIRS

    def index_map(g, bi, t, sh_s):
        return (bi, sh_s[bi, 9 + t * stride + g * _PAIRS + pair] + off, 0)
    return index_map


def _win_specs(wb, C):
    return [
        pl.BlockSpec((1, wb, C), _win_index_map(g, pair, off))
        for g in range(_GROUPS)
        for pair in range(_PAIRS)
        for off in range(2)
    ]


def _pad_table(in_keys, wb):
    """(B, V_in) sorted keys -> (B, rows, wb) padded with sentinel rows
    (anchors reach v_in//wb + 3; sentinel never matches a real query)."""
    B, v_in = in_keys.shape
    return jnp.concatenate(
        [in_keys, jnp.full((B, 4 * wb), KEY_SENTINEL, jnp.int32)], axis=1
    ).reshape(B, (v_in + 4 * wb) // wb, wb)


# The kernel holds the full bf16 weight tensor VMEM-resident; past this
# cap keyed_conv splits the contraction over C_in instead (see below).
WEIGHT_VMEM_CAP = 8 * 1024 * 1024


def keyed_fwd_ok(c_in: int, c_out: int) -> bool:
    """True when keyed_conv can run these channel widths: lanes aligned
    and the weight tensor fits under WEIGHT_VMEM_CAP after the internal
    C_in halving (each half must stay >= 64 and 64-aligned)."""
    if c_in < 64 or c_out < 64:
        return False
    while c_in * c_out * 27 * 2 > WEIGHT_VMEM_CAP:
        if c_in % 128 or c_in < 128:
            return False
        c_in //= 2
    return True


# Past this the FULL-tensor dW accumulator (27*C*Co*4) is group-split
# into (3, C, Co) blocks over a 9-step outer grid dimension.
DW_SCRATCH_CAP = 8 * 1024 * 1024


def keyed_bwd_ok(c_in: int, c_out: int) -> bool:
    """True when a SUBMANIFOLD conv at these widths can take the fully
    keyed backward (keyed_conv_ad): forward kernel admissible, the
    flipped-weights dFeats replay admissible (c_out -> c_in), and the
    group-split dW block fits VMEM. Covers the stage-4 512x512 convs
    (round 5): their backward no longer rebuilds any kernel map."""
    return (keyed_fwd_ok(c_in, c_out) and keyed_fwd_ok(c_out, c_in)
            and 3 * c_in * c_out * 4 <= DW_SCRATCH_CAP)


@functools.partial(jax.jit, static_argnames=("tile", "wb", "interpret"))
def keyed_conv(feats, in_keys, qkeym, mask, blk, shifts, weights,
               tile: int = 128, wb: int = 128, interpret: bool = False):
    """feats: (B, V_in, C); in_keys: (B, V_in) sorted; qkeym: (B, V);
    mask: (B, V) 27-bit validity; blk: (B, nt*18) flat anchors; shifts:
    (9,); weights: (27, C, Co). Returns (B, V, Co) float32.

    Misses contribute zero (no window key equals the shifted query);
    bad rows are partial and MUST be overwritten by the caller's fix-up.

    C_in SPLIT (round 5, VERDICT item 2): when the bf16 weight tensor
    exceeds WEIGHT_VMEM_CAP (the stage-4 512x512 convs: 27*512*512*2 =
    14.2 MB), the contraction is split over C_in and the kernel runs
    once per half — out = K(x[..,:h]) + K(x[..,h:]) with f32 adds in
    HBM. Each 512->512 conv becomes two passes of the proven
    (256 -> 512) kernel shape; the in-kernel s-build is recomputed per
    half (channel-independent compare work, 2x), which measurement
    shows is far cheaper than the eager (27, V) map + XLA gather path
    these convs took before."""
    B, v_in, C = feats.shape
    Co = weights.shape[-1]
    if C * Co * 27 * 2 > WEIGHT_VMEM_CAP and C % 128 == 0:
        h = C // 2
        return keyed_conv(feats[..., :h], in_keys, qkeym, mask, blk,
                          shifts, weights[:, :h], tile=tile, wb=wb,
                          interpret=interpret) + \
            keyed_conv(feats[..., h:], in_keys, qkeym, mask, blk,
                       shifts, weights[:, h:], tile=tile, wb=wb,
                       interpret=interpret)
    V = qkeym.shape[1]
    nt = V // tile
    Co = weights.shape[-1]
    keys_p = _pad_table(in_keys, wb)
    n_rows = keys_p.shape[1]
    # feature padding must cover the anchor range (v_in//wb + 3 blocks)
    feats_p = jnp.concatenate(
        [feats.astype(jnp.bfloat16),
         jnp.zeros((B, 4 * wb, C), jnp.bfloat16)], axis=1
    )
    sh = jnp.concatenate(
        [jnp.broadcast_to(shifts.astype(jnp.int32)[None], (B, 9)), blk],
        axis=1)
    wflat = weights.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, n_rows, wb), lambda bi, t, sh_s: (bi, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda bi, t, sh_s: (bi, 0, t)),
            pl.BlockSpec((1, 1, tile), lambda bi, t, sh_s: (bi, 0, t)),
            pl.BlockSpec((27, C, Co), lambda bi, t, sh_s: (0, 0, 0)),
            *_win_specs(wb, C),
        ],
        out_specs=pl.BlockSpec((1, tile, Co),
                               lambda bi, t, sh_s: (bi, t, 0)),
    )
    return pl.pallas_call(
        _keyed_conv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, V, Co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sh, keys_p, qkeym.reshape(B, 1, V), mask.reshape(B, 1, V), wflat,
      *([feats_p] * (_NW * _GROUPS)))


@functools.partial(jax.jit, static_argnames=("tile", "wb", "interpret"))
def keyed_conv_dw(feats, in_keys, qkeym, mask, blk, shifts, dout,
                  tile: int = 128, wb: int = 128, interpret: bool = False):
    """Weight gradient: (27, C, Co) float32. dout must be pre-masked
    (zeros at invalid AND at fix-up rows — see keyed_conv_ad)."""
    B, v_in, C = feats.shape
    V = qkeym.shape[1]
    nt = V // tile
    Co = dout.shape[-1]
    keys_p = _pad_table(in_keys, wb)
    n_rows = keys_p.shape[1]
    feats_p = jnp.concatenate(
        [feats.astype(jnp.bfloat16),
         jnp.zeros((B, 4 * wb, C), jnp.bfloat16)], axis=1
    )
    sh = jnp.concatenate(
        [jnp.broadcast_to(shifts.astype(jnp.int32)[None], (B, 9)), blk],
        axis=1)

    if 27 * C * Co * 4 > DW_SCRATCH_CAP:
        # group-split accumulator: grid (9, B, nt), dw block (3, C, Co)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(_GROUPS, B, nt),
            in_specs=[
                pl.BlockSpec((1, n_rows, wb),
                             lambda g, bi, t, sh_s: (bi, 0, 0)),
                pl.BlockSpec((1, 1, tile),
                             lambda g, bi, t, sh_s: (bi, 0, t)),
                pl.BlockSpec((1, 1, tile),
                             lambda g, bi, t, sh_s: (bi, 0, t)),
                pl.BlockSpec((1, tile, Co),
                             lambda g, bi, t, sh_s: (bi, t, 0)),
                *[pl.BlockSpec((1, wb, C), _win_index_map_g(pair, off))
                  for pair in range(_PAIRS) for off in range(2)],
            ],
            out_specs=pl.BlockSpec((3, C, Co),
                                   lambda g, bi, t, sh_s: (g, 0, 0)),
        )
        return pl.pallas_call(
            _keyed_dw_kernel_g,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((27, C, Co), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary",
                                     "arbitrary"),
            ),
            interpret=interpret,
        )(sh, keys_p, qkeym.reshape(B, 1, V), mask.reshape(B, 1, V),
          dout, *([feats_p] * _NW))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, n_rows, wb), lambda bi, t, sh_s: (bi, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda bi, t, sh_s: (bi, 0, t)),
            pl.BlockSpec((1, 1, tile), lambda bi, t, sh_s: (bi, 0, t)),
            pl.BlockSpec((1, tile, Co), lambda bi, t, sh_s: (bi, t, 0)),
            *_win_specs(wb, C),
        ],
        out_specs=pl.BlockSpec((27, C, Co),
                               lambda bi, t, sh_s: (0, 0, 0)),
    )
    return pl.pallas_call(
        _keyed_dw_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((27, C, Co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sh, keys_p, qkeym.reshape(B, 1, V), mask.reshape(B, 1, V), dout,
      *([feats_p] * (_NW * _GROUPS)))


# ---------------------------------------------------------------------------
# Differentiable entries
# ---------------------------------------------------------------------------

def _flip_weights(weights):
    """Transpose-conv weights: offset k -> -offset = 26-k; C_in/C_out
    swap (sparse_conv_kernel.flip_weights)."""
    return weights[::-1].transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def keyed_conv_ad(feats, in_keys, qkeym, mask, blk, shifts, weights,
                  fix_rows, fix_nbr, tile=128, wb=128, interpret=False):
    """Differentiable keyed conv for SUBMANIFOLD convs (input sites ==
    output sites). fix_rows/fix_nbr come from build_fix_plan — threaded
    so the BACKWARD can mirror the caller's forward fix-up: the keyed
    replay with flipped weights is exact at every row except the bad
    rows (same set as forward — identical anchors and queries), where
    the exact gather transpose conv overwrites dFeats."""
    return keyed_conv(feats, in_keys, qkeym, mask, blk, shifts, weights,
                      tile=tile, wb=wb, interpret=interpret)


def _kc_fwd(feats, in_keys, qkeym, mask, blk, shifts, weights,
            fix_rows, fix_nbr, tile, wb, interpret):
    out = keyed_conv(feats, in_keys, qkeym, mask, blk, shifts, weights,
                     tile=tile, wb=wb, interpret=interpret)
    return out, (feats, in_keys, qkeym, mask, blk, shifts, weights,
                 fix_rows, fix_nbr)


def _kc_bwd(tile, wb, interpret, res, dout):
    from vdetr_tpu.ops.sparse_conv import _gather_matmul

    (feats, in_keys, qkeym, mask, blk, shifts, weights,
     fix_rows, fix_nbr) = res
    dout = dout.astype(jnp.float32)
    fw = _flip_weights(weights)
    dfeats = keyed_conv(dout, in_keys, qkeym, mask, blk, shifts, fw,
                        tile=tile, wb=wb, interpret=interpret)
    # exact dFeats at the bad rows m: gather dout over fix_nbr with
    # flipped weights (submanifold stencil symmetry: nbr[26-k, m] == n
    # iff nbr[k, n] == m). No double-count: the caller's _apply_fixup
    # VJP zeroes dout at fixed rows before it reaches this kernel and
    # routes their dFeats terms through its own gather VJP.
    fixed = jax.vmap(lambda d, i: _gather_matmul(d, i, fw))(dout, fix_nbr)
    dfeats = jax.vmap(
        lambda o, r, x: o.at[r].set(x, mode="drop")
    )(dfeats, fix_rows, fixed)
    dfeats = dfeats.astype(feats.dtype)
    dw = keyed_conv_dw(feats, in_keys, qkeym, mask, blk, shifts, dout,
                       tile=tile, wb=wb, interpret=interpret
                       ).astype(weights.dtype)
    return dfeats, None, None, None, None, None, dw, None, None


keyed_conv_ad.defvjp(_kc_fwd, _kc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def keyed_conv_fwdk(feats, in_keys, qkeym, mask, blk, shifts, weights,
                    q0, qvalid, extent=None, tile=128, wb=128,
                    interpret=False, r=1):
    """Keyed kernel FORWARD with lazily-mapped XLA-gather BACKWARD.

    For convs where the flipped-weights dFeats identity does not hold
    (stride-2: output sites != input sites) or where the dW kernel's
    f32 VMEM scratch would not fit. The backward REBUILDS the (27, V)
    neighbor map from the saved keys/coords via the z-run sort path and
    replays the gather conv's vjp — eval never pays for a map at all;
    training pays it once in backward (exactly what the eager map cost
    in forward before). q0: (B, V, 3) query centers in the TABLE's
    lattice units; qvalid: (B, V).
    """
    return keyed_conv(feats, in_keys, qkeym, mask, blk, shifts, weights,
                      tile=tile, wb=wb, interpret=interpret)


def _kcf_fwd(feats, in_keys, qkeym, mask, blk, shifts, weights, q0,
             qvalid, extent, tile, wb, interpret, r):
    out = keyed_conv(feats, in_keys, qkeym, mask, blk, shifts, weights,
                     tile=tile, wb=wb, interpret=interpret)
    return out, (feats, in_keys, weights, q0, qvalid)


def _kcf_bwd(extent, tile, wb, interpret, r, res, dout):
    from vdetr_tpu.ops.sparse_conv import _gather_matmul, _zrun_neighbors

    feats, in_keys, weights, q0, qvalid = res
    nbr = jax.vmap(
        lambda k, q, v: _zrun_neighbors(k, q, v, extent, r)
    )(in_keys, q0, qvalid)
    _, vjp = jax.vjp(
        lambda f, w: jax.vmap(
            lambda ff, ii: _gather_matmul(ff, ii, w))(f, nbr),
        feats, weights)
    df, dw = vjp(dout.astype(jnp.float32))
    return (df.astype(feats.dtype), None, None, None, None, None,
            dw.astype(weights.dtype), None, None)


keyed_conv_fwdk.defvjp(_kcf_fwd, _kcf_bwd)
