"""Windowed Mosaic kernel for sparse-conv kernel-MAP construction.

Replaces the merged double-sorts of `sparse_conv._zrun_neighbors`
(reference semantics: MinkowskiEngine coordinate-manager kernel maps,
models/mink_resnet.py via ME internals) for the 3x3x3 stencil. The
double-sort path processes 10*V rows through TWO stable multi-operand
XLA sorts plus three int32 window gathers per map — measured 39/20/12/7
ms for the four backbone levels (ROUND3_NOTES.md), the single largest
block of the eval forward.

This kernel exploits the same structure as the window CONV kernel
(ops/sparse_conv_kernel.py): query keys are the table keys plus a
per-(dx,dy)-group constant, so within a group the queries of a sorted
output tile are ASCENDING and their matches live in a narrow rank
window of the sorted table. Per (tile, group) the kernel DMAs two
2*wb-row key windows (anchored at the ranks of the tile's min and max
shifted query, found by one small rank lookup over 18*nt anchor values)
and resolves all three dz offsets by integer compare against the window:

    D[v, l] = win[l] - (qkey[v] + c_g)      # (T, 4*wb) int32
    nbr[g*3+e][v] = sum_l where(D == e-1, global_index[l], 0)

Misses never match; out-of-range offsets (lattice borders, where the
shifted key would WRAP into a different coordinate's key) are masked by
a precomputed 27-bit validity mask. Queries falling strictly between
the two windows' key ranges cannot be decided (their match could live
in the uncovered rank gap) and are flagged `bad`; the caller patches
them with an exact compacted double-sort lookup (budgeted; full
fallback to the sort path past the budget), so the map is ALWAYS exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdetr_tpu.ops.voxelize import KEY_SENTINEL, lookup, lookup_rank, pack_keys

_GROUPS = 9
_W = 3
_PAIRS = 2  # window pairs per (tile, group): low-anchored + high-anchored
# stand-in for SENTINEL query keys: large enough to sort after every real
# key yet small enough that adding the largest group shift (~(GY+1)*GZ+1,
# ~1.05M at the default extent) stays below INT32_MAX
_BIGQ = jnp.int32(2_100_000_000)


def _group_shifts(extent):
    """c_g for the 9 (dx, dy) groups, x-major (matches _offsets order);
    the in-group dz offsets are c_g + e, e in {-1, 0, 1}."""
    _, gy, gz = extent
    return [(dx * gy + dy) * gz for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def offset_validity_mask(coords, valid, extent):
    """(..., V) int32 bitmask: bit k set iff coords + offsets[k] is
    inside `extent` (x-major/z-fastest enumeration, matching
    sparse_conv._offsets)."""
    gx, gy, gz = extent
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    mask = jnp.zeros(x.shape, jnp.int32)
    k = 0
    for dx in (-1, 0, 1):
        xv = (x + dx >= 0) & (x + dx < gx)
        for dy in (-1, 0, 1):
            yv = (y + dy >= 0) & (y + dy < gy)
            for dz in (-1, 0, 1):
                zv = (z + dz >= 0) & (z + dz < gz)
                bit = (xv & yv & zv & valid).astype(jnp.int32)
                mask = mask | (bit << k)
                k += 1
    return mask


def _group_valid(mask):
    """(9, V) group validity (any dz bit set) from the 27-bit mask."""
    outs = []
    for g in range(_GROUPS):
        bits = ((mask >> (g * _W)) | (mask >> (g * _W + 1))
                | (mask >> (g * _W + 2))) & 1
        outs.append(bits > 0)
    return jnp.stack(outs)


def build_anchors(in_keys, qkeym, gvalid, extent, v_in: int, tile: int,
                  wb: int):
    """Per-(tile, group) window anchor blocks.

    in_keys: (V_in,) sorted table keys; qkeym: (V,) shifted-safe query
    keys (_BIGQ at invalid rows); gvalid: (9, V) group validity
    (x/y offsets in range). Returns flat (nt*18,) int32 anchors
    [bA, bB] per (t, g) — the kernel reads wb-row blocks [b, b+1] of
    the (rows, wb)-reshaped padded key table for each.

    bA anchors at the rank of the tile's minimum shifted query (so every
    match position is >= bA*wb); bB so its window covers the rank of the
    maximum (every match position is <= it), clamped up to bA+2 so the
    four wb-blocks are DISJOINT (a key appearing twice would double the
    one-hot index sum). When the natural bB <= bA+2 the blocks are
    contiguous and coverage is complete; otherwise queries between the
    pairs are flagged bad by the kernel and patched exactly.
    """
    V = qkeym.shape[0]
    nt = V // tile
    shifts = jnp.asarray(_group_shifts(extent), jnp.int32)  # (9,)
    q = qkeym[None, :] + shifts[:, None]                    # (9, V)
    qt = q.reshape(_GROUPS, nt, tile)
    gv = gvalid.reshape(_GROUPS, nt, tile)
    big = jnp.int32(2_147_000_000)
    lo = jnp.where(gv, qt - 1, big).min(axis=2)             # (9, nt)
    hi = jnp.where(gv, qt + 1, -1).max(axis=2)              # (9, nt)
    ranks = lookup_rank(in_keys, jnp.stack([lo, hi]))       # (2, 9, nt)
    max_blk = v_in // wb + 2  # table padded by 4*wb rows
    bA = jnp.clip(ranks[0] // wb, 0, max_blk).astype(jnp.int32)
    bBn = jnp.clip(ranks[1] // wb - 1, 0, max_blk).astype(jnp.int32)
    bB = jnp.maximum(bA + 2, bBn)  # bA <= v_in//wb, so bB <= max_blk
    blk = jnp.stack([bA, bB], axis=-1)                      # (9, nt, 2)
    return jnp.transpose(blk, (1, 0, 2)).reshape(nt * _GROUPS * _PAIRS)


def _make_map_kernel(v_in: int, wb: int):
    """Kernel body. Blocks: sh_ref SMEM (B, 9 + nt*18) = group shifts ++
    flat anchors; tab_ref (1, rows, wb) — the ENTIRE padded key table,
    VMEM-resident for all nt tiles of a batch row (65k keys = 256 KB;
    window DMAs via BlockSpec index maps would need 8-sublane-aligned
    blocks, so windows are in-kernel `pl.ds` sublane slices instead);
    qk/mask (1, 1, T); outputs nbr (1, 27, T) int32, bad (1, 1, T)
    int32."""

    def kernel(sh_ref, tab_ref, qk_ref, mask_ref, out_ref, bad_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)
        stride = _GROUPS * _PAIRS

        qk = qk_ref[0, 0, :][:, None]          # (T, 1)
        mask = mask_ref[0, 0, :][:, None]      # (T, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1)
        bad = jnp.zeros(qk.shape, jnp.int32)
        for g in range(_GROUPS):
            bA = sh_ref[b, 9 + t * stride + g * _PAIRS]
            bB = sh_ref[b, 9 + t * stride + g * _PAIRS + 1]
            winA = tab_ref[0, pl.ds(bA, 2), :]  # (2, wb)
            winB = tab_ref[0, pl.ds(bB, 2), :]  # (2, wb)
            q = qk + sh_ref[b, g]               # (T, 1)
            # decidability: a query strictly between pair A's last key
            # and pair B's first key may match in the uncovered rank gap
            # (only possible when the pairs are not contiguous); keys
            # ascend, so max/min give the boundary values
            amax = jnp.max(winA[1:2, :])
            bmin = jnp.min(winB[0:1, :])
            gap = (bB > bA + 2).astype(jnp.int32)
            rows = [(winA[0:1, :], bA), (winA[1:2, :], bA + 1),
                    (winB[0:1, :], bB), (winB[1:2, :], bB + 1)]
            idx = [jnp.zeros(qk.shape, jnp.int32) for _ in range(_W)]
            hit = [jnp.zeros(qk.shape, jnp.int32) for _ in range(_W)]
            for row, blk_row in rows:
                D = row - q                     # (T, wb)
                gidx = lane + blk_row * wb      # (1, wb) global indices
                for e in range(_W):
                    m = D == (e - 1)
                    idx[e] = idx[e] + jnp.sum(
                        jnp.where(m, gidx, 0), axis=1, keepdims=True)
                    hit[e] = hit[e] + jnp.sum(
                        m.astype(jnp.int32), axis=1, keepdims=True)
            for e in range(_W):
                k = g * _W + e
                vb = (mask >> k) & 1            # (T, 1)
                out_ref[0, k, :] = jnp.where(
                    (hit[e] > 0) & (vb > 0), idx[e], jnp.int32(v_in)
                )[:, 0]
                qe = q + (e - 1)
                bad = bad | (vb * gap
                             * (qe > amax).astype(jnp.int32)
                             * (qe < bmin).astype(jnp.int32))
        bad_ref[0, 0, :] = bad[:, 0]

    return kernel


@functools.partial(jax.jit, static_argnames=("tile", "wb", "interpret"))
def window_map(in_keys, qkeym, mask, blk, shifts, tile: int = 128,
               wb: int = 128, interpret: bool = False):
    """Run the map kernel.

    in_keys: (B, V_in) sorted table keys (V_in % wb == 0); qkeym: (B, V)
    shifted-safe query keys; mask: (B, V) 27-bit validity; blk:
    (B, nt*18) flat anchors; shifts: (9,) group shifts. Returns
    (nbr (B, 27, V) int32, bad (B, V) bool).
    """
    B, v_in = in_keys.shape
    V = qkeym.shape[1]
    nt = V // tile
    assert v_in % wb == 0 and V % tile == 0
    # pad the table with 4*wb sentinel rows and shape it (rows, wb) so a
    # window is two `pl.ds` sublane rows; sentinel rows never match (max
    # real key + max shift < _BIGQ < SENTINEL)
    keys_p = jnp.concatenate(
        [in_keys, jnp.full((B, 4 * wb), KEY_SENTINEL, jnp.int32)], axis=1
    ).reshape(B, (v_in + 4 * wb) // wb, wb)
    n_rows = (v_in + 4 * wb) // wb
    sh = jnp.concatenate(
        [jnp.broadcast_to(shifts.astype(jnp.int32)[None], (B, 9)), blk],
        axis=1)
    qk3 = qkeym.reshape(B, 1, V)
    mk3 = mask.reshape(B, 1, V)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, n_rows, wb), lambda bi, t, sh_s: (bi, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda bi, t, sh_s: (bi, 0, t)),
            pl.BlockSpec((1, 1, tile), lambda bi, t, sh_s: (bi, 0, t)),
        ],
        out_specs=[
            pl.BlockSpec((1, 27, tile), lambda bi, t, sh_s: (bi, 0, t)),
            pl.BlockSpec((1, 1, tile), lambda bi, t, sh_s: (bi, 0, t)),
        ],
    )
    nbr, bad = pl.pallas_call(
        _make_map_kernel(v_in, wb),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 27, V), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, V), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sh, keys_p, qk3, mk3)
    return nbr, bad[:, 0, :] > 0


def stencil_map(in_keys, q0, qvalid, extent, tile: int = 128,
                wb: int = 128, fix_budget: int = 0,
                interpret: bool = False):
    """Full 27-offset neighbor map via the window kernel + exact fix-up.

    in_keys: (B, V_in) sorted; q0: (B, V, 3) integer query centers in
    the TABLE's lattice units (own coords for submanifold, 2*out_coords
    for stride-2); qvalid: (B, V). Returns ((B, 27, V) int32 map,
    n_unpatched ()): undecidable rows are patched by a compacted
    double-sort lookup; rows beyond fix_budget stay unpatched and
    n_unpatched > 0 tells the caller to fall back to the exact sort
    path (lax.cond) for the whole map.
    """
    B, v_in = in_keys.shape
    V = q0.shape[1]
    if fix_budget <= 0:
        fix_budget = max(tile, V // 16)
    qkey = pack_keys(q0, extent)
    qv = qvalid & (qkey != KEY_SENTINEL)
    qkeym = jnp.where(qv, qkey, _BIGQ)
    mask = offset_validity_mask(q0, qv, extent)
    shifts = jnp.asarray(_group_shifts(extent), jnp.int32)
    blk = jax.vmap(
        lambda k, q, m: build_anchors(k, q, _group_valid(m), extent,
                                      v_in, tile, wb)
    )(in_keys, qkeym, mask)
    nbr, bad = window_map(in_keys, qkeym, mask, blk, shifts,
                          tile=tile, wb=wb, interpret=interpret)

    # exact patch for undecidable rows: compact them, look up all 27
    # expected keys with the double-sort, write back
    def patch(one_keys, one_nbr, one_bad, one_q0, one_mask):
        order = jnp.where(one_bad, jnp.arange(V, dtype=jnp.int32),
                          jnp.int32(V))
        rows = jnp.sort(order)[:fix_budget]
        used = rows < V
        safe = jnp.clip(rows, 0, V - 1)
        fq0 = jnp.take(one_q0, safe, axis=0)
        fmask = jnp.take(one_mask, safe)
        ek = []
        kk = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    q = fq0 + jnp.asarray([dx, dy, dz], jnp.int32)
                    key = pack_keys(q, extent)
                    ok = used & (((fmask >> kk) & 1) > 0)
                    ek.append(jnp.where(ok, key, KEY_SENTINEL))
                    kk += 1
        fix = lookup(one_keys, jnp.stack(ek))        # (27, R)
        return one_nbr.at[:, safe].set(
            jnp.where(used[None, :], fix, one_nbr[:, safe]))

    patched = jax.vmap(patch)(in_keys, nbr, bad, q0, mask)
    n_unpatched = jnp.maximum(
        bad.sum(axis=1).max() - fix_budget, 0)
    return patched, n_unpatched
