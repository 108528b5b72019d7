"""Windowed one-hot Mosaic kernel for submanifold sparse convolution.

Replaces the XLA row-gather inner loop of `sparse_conv` (reference
semantics: MinkowskiEngine submanifold convolution, models/mink_resnet.py)
for the hot stride-1 3x3x3 convs. The XLA gather moves 27 * V rows of
C*4 bytes at ~50-85 GB/s effective (tools/stage_conv_micro.py); this
kernel exploits the z-fastest sorted-key structure instead:

- For a fixed (dx, dy) offset group the three dz neighbor ranks of a
  sorted output tile are near-contiguous and MONOTONE, so the whole
  tile's neighbors live in a small contiguous window of input rows.
  Per (tile, group) the kernel DMAs two Wb-row window blocks
  (contiguous HBM streams at full bandwidth, scalar-prefetched block
  index) instead of per-row gathers.
- Row selection inside the window is a ONE-HOT MATMUL: S_e[v, l] =
  (l == window-local index of v's dz=e neighbor), built by an iota
  compare against a precomputed index (misses encode as -1 and never
  match), then X_e = S_e @ window runs on the MXU. This is the same
  gather-free trick the fused RPE kernel uses for trilinear sampling.
- Weight contraction accumulates float32; one-hot and window matmuls
  run at the TPU-default bf16-input matmul precision (which is also
  what the XLA path uses — see ROUND3_NOTES.md finding 1).

Exactness: window coverage can overflow when a tile's neighbor ranks
span more than 2*Wb rows (pathological layouts). The map builder
returns an `overflow` flag; `sparse_conv` falls back to the XLA gather
path via lax.cond, so results are ALWAYS exact.

Backward: for submanifold convs (input sites == output sites) the
dFeats pass is the SAME kernel with flipped offsets and transposed
kernels — offsets[k'] = -offsets[k] means k' = 26 - k in the
x-major/z-fastest enumeration — so dFeats = window_conv(dOut,
W[::-1].transpose(0, 2, 1)). dW accumulates per-tile X^T dOut in a
VMEM scratch and writes on the last tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GROUPS = 9
_W = 3  # dz window width (kernel_size 3)


def build_window_map(nbr_idx, v_in: int, tile: int, wb: int):
    """Precompute the kernel's index arrays from a (K=27, V) neighbor map.

    nbr_idx: (27, V) int32 global input-row indices, v_in = miss (the
    zero-pad row of the XLA path). Offsets are x-major/z-fastest, so
    offset k belongs to (dx, dy) group k // 3.

    DUAL-CLUSTER WINDOWS: a tile straddling an x-slice boundary has its
    neighbor ranks split into TWO narrow clusters one slice apart (the
    far cluster is the next x-slice — spans of ~2000 rows at the 2 cm
    level on real scans, 4-5% of tiles in every dx != 0 group, which
    under a single window forced the whole conv onto the XLA fallback).
    Each (tile, group) therefore anchors TWO independent 2*wb-row window
    pairs: pair A at the minimum neighbor rank, pair B at the minimum
    rank NOT covered by A. With tile == wb each cluster is at most
    ~tile+2 rows wide and always fits a pair, so overflow only occurs
    for >= 3 clusters in one tile (not observed on surface scans; the
    exact XLA fallback still guards it).

    Returns (blk, le, bad_rows):
      blk: (nt*18,) int32 — flat block anchors (units of wb rows) of
           pairs A and B; the kernel DMAs rows [b*wb, b*wb + 2*wb) each.
      le:  (9, 3, V) int32 — window-local index: [0, 2*wb) in pair A,
           [2*wb, 4*wb) in pair B, -1 for misses/overflow.
      bad_rows: (V,) bool — rows with a valid neighbor that fit neither
           pair (the caller either gathers a per-tile exact fix-up for
           them or falls back to the XLA path).
    """
    V = nbr_idx.shape[1]
    nt = V // tile
    imax = jnp.iinfo(jnp.int32).max
    idx = nbr_idx.reshape(_GROUPS, _W, V)
    hit = idx < v_in
    big = jnp.where(hit, idx, imax)
    idx_t = big.reshape(_GROUPS, _W, nt, tile)
    max_blk = v_in // wb  # feats are padded by 2*wb rows; blk+1 stays valid

    def anchor(cands):
        bt = cands.min(axis=(1, 3))  # (9, nt)
        b = jnp.where(bt == imax, 0, bt // wb)
        return jnp.clip(b, 0, max_blk).astype(jnp.int32)

    b1 = anchor(idx_t)
    loA = (b1 * wb)[:, None, :, None]
    inA = (idx_t >= loA) & (idx_t <= loA + 2 * wb - 1)
    b2 = anchor(jnp.where(inA, imax, idx_t))
    loB = (b2 * wb)[:, None, :, None]
    inB = (idx_t >= loB) & (idx_t <= loB + 2 * wb - 1) & ~inA
    le_t = jnp.where(inA, idx_t - loA,
                     jnp.where(inB, 2 * wb + idx_t - loB, -1))
    hit_t = idx_t != imax
    bad_rows = (hit_t & ~inA & ~inB).any(axis=(0, 1)).reshape(V)
    le = le_t.reshape(_GROUPS, _W, V).astype(jnp.int32)
    blk = jnp.stack([b1, b2], axis=-1)  # (9, nt, 2)
    # FLAT (nt*18,) layout: an (nt, 9, 2) scalar-prefetch operand pads
    # its trailing dims in SMEM (~2 MB vs the 1 MB budget at nt=512)
    blk = jnp.transpose(blk, (1, 0, 2)).reshape(nt * _GROUPS * _PAIRS)
    return blk, le, bad_rows


def build_fixup(nbr_idx, bad_rows, v_in: int, tile: int, max_tiles: int):
    """Compact the bad tiles into an exact gather-based fix-up plan.

    bad_rows: (V,) bool from build_window_map. Returns (rows, fix_nbr,
    fallback): rows (max_tiles*tile,) int32 row indices (V for unused
    slots), fix_nbr (27, max_tiles*tile) the neighbor map restricted to
    those rows (pointing at the miss row for unused slots), and
    fallback () bool — more bad tiles than max_tiles (use the full XLA
    path). The kernel's output for listed rows is OVERWRITTEN by a
    27-offset gather conv, which is bit-identical to the XLA path, so
    scattered-neighbor tiles (e.g. wall tiles whose x+-1 neighbors
    spread over a whole slice) cost one small gather instead of
    forcing the entire conv onto the fallback."""
    V = bad_rows.shape[0]
    nt = V // tile
    tile_bad = bad_rows.reshape(nt, tile).any(axis=1)
    order = jnp.where(tile_bad, jnp.arange(nt, dtype=jnp.int32),
                      jnp.int32(nt))
    order = jnp.sort(order)[:max_tiles]  # bad tiles first, nt = unused
    used = order < nt
    rows = (order[:, None] * tile
            + jnp.arange(tile, dtype=jnp.int32)[None, :])
    rows = jnp.where(used[:, None], rows, V).reshape(-1)
    safe = jnp.clip(rows, 0, V - 1)
    fix_nbr = jnp.take(nbr_idx, safe, axis=1)
    fix_nbr = jnp.where((rows < V)[None, :], fix_nbr, v_in)
    fallback = tile_bad.sum() > max_tiles
    return rows, fix_nbr, fallback


_PAIRS = 2  # dual-cluster windows: 2 anchor pairs x 2 blocks per group


def _conv_kernel(blk_ref, le_ref, w_ref, *refs):
    """Grid (B, nt). refs = 36 window refs (pairA0, pairA1, pairB0,
    pairB1 per group) then out_ref.

    le_ref block: (1, 9, 3, T); w_ref: (27, C, Co) bf16 full;
    window refs: (1, Wb, C); out: (1, T, Co) f32.
    """
    nw = 2 * _PAIRS
    wins = refs[: nw * _GROUPS]
    out_ref = refs[nw * _GROUPS]
    T = le_ref.shape[3]
    C = wins[0].shape[2]
    Co = w_ref.shape[2]
    wb = wins[0].shape[1]
    # one (3T, 4Wb) one-hot matmul per group instead of three (T, 4Wb):
    # the MXU runs M=3T at ~3x the utilization of three M=T matmuls.
    # (A direct (3,T)->(3T,1) reshape of the le block is an unsupported
    # Mosaic shape cast; build per-e masks and concat on sublanes.)
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * _PAIRS * wb), 1)
    acc = jnp.zeros((T, Co), jnp.float32)
    for g in range(_GROUPS):
        win = jnp.concatenate(
            [wins[nw * g + j][0] for j in range(nw)], axis=0
        ).astype(jnp.bfloat16)  # (4Wb, C)
        s = jnp.concatenate(
            [(iota == le_ref[0, g, e, :][:, None]).astype(jnp.bfloat16)
             for e in range(_W)], axis=0)  # (3T, 4Wb)
        x = jax.lax.dot_general(
            s, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (3T, C)
        for e in range(_W):
            acc = acc + jax.lax.dot_general(
                x[e * T:(e + 1) * T], w_ref[g * _W + e],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc


def _win_index_map(g, pair, off):
    stride = _GROUPS * _PAIRS

    def index_map(bi, t, blk_s):
        return (bi, blk_s[bi, t * stride + g * _PAIRS + pair] + off, 0)
    return index_map


def _win_specs(wb, C):
    return [
        pl.BlockSpec((1, wb, C), _win_index_map(g, pair, off))
        for g in range(_GROUPS)
        for pair in range(_PAIRS)
        for off in range(2)
    ]


@functools.partial(jax.jit,
                   static_argnames=("tile", "wb", "interpret"))
def window_conv(feats, blk, le, weights, tile: int = 256, wb: int = 256,
                interpret: bool = False):
    """feats: (B, V_in, C); blk: (B, nt*18) flat anchors; le: (B, 9, 3, V);
    weights: (27, C, Co). Returns (B, V, Co) float32.

    V (output rows) = le.shape[-1]; misses contribute zero (le == -1
    never matches the window iota). feats rows beyond V_in are read only
    as window padding and multiplied by zero. Window DMAs move bf16
    (the in-kernel matmuls are bf16-input anyway — the cast is one
    fused stream pass, the DMA bytes halve)."""
    B, v_in, C = feats.shape
    V = le.shape[-1]
    nt = V // tile  # blk is pre-flattened (nt*18,); index maps stride it
    Co = weights.shape[-1]
    # pad so every window block [blk*wb, blk*wb + 2*wb) is in range
    feats_p = jnp.concatenate(
        [feats.astype(jnp.bfloat16),
         jnp.zeros((B, 2 * wb, C), jnp.bfloat16)], axis=1
    )
    wflat = weights.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, _GROUPS, _W, tile),
                         lambda bi, t, blk_s: (bi, 0, 0, t)),
            pl.BlockSpec((27, C, Co), lambda bi, t, blk_s: (0, 0, 0)),
            *_win_specs(wb, C),
        ],
        out_specs=pl.BlockSpec((1, tile, Co),
                               lambda bi, t, blk_s: (bi, t, 0)),
    )
    return pl.pallas_call(
        _conv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, V, Co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(blk, le, wflat, *([feats_p] * (2 * _PAIRS * _GROUPS)))


def flip_weights(weights):
    """Weights of the transpose (gradient) submanifold conv: offset k
    maps to -offset = index 26-k; in/out channels swap."""
    return weights[::-1].transpose(0, 2, 1)


def _dw_kernel(blk_ref, le_ref, dout_ref, *refs):
    """Grid (B, nt). refs = 36 window refs then dw_ref (27, C, Co) f32.

    Recomputes the gathered X_e per tile (same one-hot windows as the
    forward) and accumulates dW[k] += X_e^T @ dOut across all tiles and
    batch rows; dw_ref is revisited at every grid step (constant index
    map) so the accumulator lives in VMEM for the whole pass.
    """
    nw = 2 * _PAIRS
    wins = refs[: nw * _GROUPS]
    dw_ref = refs[nw * _GROUPS]
    T = le_ref.shape[3]
    wb = wins[0].shape[1]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    iota = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * _PAIRS * wb), 1)
    dout = dout_ref[0].astype(jnp.bfloat16)  # (T, Co)
    for g in range(_GROUPS):
        win = jnp.concatenate(
            [wins[nw * g + j][0] for j in range(nw)], axis=0
        ).astype(jnp.bfloat16)
        s = jnp.concatenate(
            [(iota == le_ref[0, g, e, :][:, None]).astype(jnp.bfloat16)
             for e in range(_W)], axis=0)  # (3T, 4Wb)
        x = jax.lax.dot_general(
            s, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (3T, C)
        for e in range(_W):
            dw_ref[g * _W + e] += jax.lax.dot_general(
                x[e * T:(e + 1) * T], dout, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


@functools.partial(jax.jit,
                   static_argnames=("tile", "wb", "interpret"))
def window_conv_dw(feats, blk, le, dout, tile: int = 256, wb: int = 256,
                   interpret: bool = False):
    """Weight gradient of window_conv: (27, C, Co) float32.

    feats: (B, V_in, C); dout: (B, V, Co) (pre-masked by the caller's
    validity VJP); blk/le as in window_conv.
    """
    B, v_in, C = feats.shape
    V = le.shape[-1]
    nt = V // tile
    Co = dout.shape[-1]
    feats_p = jnp.concatenate(
        [feats.astype(jnp.bfloat16),
         jnp.zeros((B, 2 * wb, C), jnp.bfloat16)], axis=1
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, _GROUPS, _W, tile),
                         lambda bi, t, blk_s: (bi, 0, 0, t)),
            pl.BlockSpec((1, tile, Co), lambda bi, t, blk_s: (bi, t, 0)),
            *_win_specs(wb, C),
        ],
        out_specs=pl.BlockSpec((27, C, Co),
                               lambda bi, t, blk_s: (0, 0, 0)),
    )
    return pl.pallas_call(
        _dw_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((27, C, Co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(blk, le, dout, *([feats_p] * (2 * _PAIRS * _GROUPS)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def window_conv_ad(feats, blk, le, weights, fix_rows, fix_nbr,
                   tile=256, wb=256, interpret=False):
    """Differentiable window_conv for SUBMANIFOLD convs (input sites ==
    output sites — required by the flipped-map dFeats identity).

    fix_rows/fix_nbr are the build_fixup plan for this map. The FORWARD
    fix-up stays in the caller (sparse_conv._apply_fixup); they are
    threaded here because the BACKWARD needs its own mirror: le's -1
    holes at bad (scattered-neighbor) rows m would otherwise drop
    dout[n] @ W[k]^T terms from output rows n that consumed feats[m] in
    the forward (le[k, n] >= 0 but le[26-k, m] == -1 — window coverage
    is not symmetric)."""
    return window_conv(feats, blk, le, weights, tile=tile, wb=wb,
                       interpret=interpret)


def _wc_fwd(feats, blk, le, weights, fix_rows, fix_nbr,
            tile, wb, interpret):
    out = window_conv(feats, blk, le, weights, tile=tile, wb=wb,
                      interpret=interpret)
    return out, (feats, blk, le, weights, fix_rows, fix_nbr)


def _wc_bwd(tile, wb, interpret, res, dout):
    # local import to avoid a module cycle with sparse_conv
    from vdetr_tpu.ops.sparse_conv import _gather_matmul

    feats, blk, le, weights, fix_rows, fix_nbr = res
    dout = dout.astype(jnp.float32)
    fw = flip_weights(weights)
    dfeats = window_conv(dout, blk, le, fw,
                         tile=tile, wb=wb, interpret=interpret)
    # Mirror of the forward fix-up: overwrite dfeats at the fix rows m
    # with the exact gather TRANSPOSE conv (submanifold stencil symmetry:
    # nbr[26-k, m] == n  iff  nbr[k, n] == m, so gathering dout over
    # fix_nbr with flipped weights sums exactly the dout[n] @ W[k]^T
    # terms the windowed replay drops at le == -1 holes). Contributions
    # from FIXED output rows are not double-counted: the caller's
    # _apply_fixup .at[rows].set VJP zeroes dout at those rows and adds
    # their dfeats terms through its own gather VJP.
    fixed = jax.vmap(lambda d, i: _gather_matmul(d, i, fw))(dout, fix_nbr)
    dfeats = jax.vmap(
        lambda o, r, x: o.at[r].set(x, mode="drop")
    )(dfeats, fix_rows, fixed)
    dfeats = dfeats.astype(feats.dtype)
    dw = window_conv_dw(feats, blk, le, dout, tile=tile, wb=wb,
                        interpret=interpret).astype(weights.dtype)
    return dfeats, None, None, dw, None, None


window_conv_ad.defvjp(_wc_fwd, _wc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def window_conv_fwdk(feats, blk, le, nbr, weights, tile=256, wb=256,
                     interpret=False):
    """Kernel FORWARD with XLA-gather BACKWARD.

    For convs where the flipped-map dFeats identity does not hold
    (stride-2: output sites != input sites) or where the dW kernel's
    f32 VMEM scratch would not fit (C_in * C_out > 256 * 256). The
    backward replays the XLA gather path's vjp — eval gets the kernel,
    training pays the same backward it does today. nbr is the (B, 27, V)
    neighbor map the XLA path needs."""
    return window_conv(feats, blk, le, weights, tile=tile, wb=wb,
                       interpret=interpret)


def _xla_gather_conv(feats, nbr, weights):
    # local import to avoid a module cycle with sparse_conv
    from vdetr_tpu.ops.sparse_conv import _gather_matmul

    return jax.vmap(lambda f, i: _gather_matmul(f, i, weights))(feats, nbr)


def _wcf_fwd(feats, blk, le, nbr, weights, tile, wb, interpret):
    out = window_conv(feats, blk, le, weights, tile=tile, wb=wb,
                      interpret=interpret)
    return out, (feats, nbr, weights)


def _wcf_bwd(tile, wb, interpret, res, dout):
    feats, nbr, weights = res
    _, vjp = jax.vjp(lambda f, w: _xla_gather_conv(f, nbr, w),
                     feats, weights)
    df, dw = vjp(dout.astype(jnp.float32))
    return df.astype(feats.dtype), None, None, None, dw

window_conv_fwdk.defvjp(_wcf_fwd, _wcf_bwd)
