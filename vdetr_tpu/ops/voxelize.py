"""Batched, static-shape voxelization (TPU replacement for
MinkowskiEngine's `batch_sparse_collate` / coordinate manager, reference
models/model_vdetr.py:250-261).

Design: per sample, voxels live in a padded array of static capacity V,
sorted by a packed int32 key. Lookups (needed by sparse convolutions) are
binary searches into the sorted key array — O(log V) fully vectorized
gathers, no host sync, no dynamic shapes.

Key packing: level-local integer coords (x, y, z) with per-level extents
(GX, GY, GZ) pack to `(x * GY + y) * GZ + z`. The base extents default to
(2048, 2048, 511) voxels so the largest key stays below INT32_MAX (the
sentinel for empty slots). Coordinates are shifted per sample so the
minimum is >= 0; the shift is aligned down to a multiple of the deepest
stride so voxel *grouping parity* across downsampling levels matches an
absolute-coordinate implementation (MinkowskiEngine groups by absolute
parity).
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

KEY_SENTINEL = jnp.iinfo(jnp.int32).max
DEFAULT_EXTENT = (2048, 2048, 511)


@flax.struct.dataclass
class VoxelGrid:
    """One level of a sparse voxel hierarchy (batched, padded).

    coords: (B, V, 3) int32, level-local units (world = (coords * stride
            + origin) * voxel_size); invalid rows are 0.
    keys:   (B, V) int32, ascending, invalid rows = KEY_SENTINEL.
    features: (B, V, C) float, invalid rows are 0.
    valid:  (B, V) bool.
    origin: (B, 3) int32 base-lattice offset (multiple of the max stride).
    stride: static int, in base-lattice units.
    extent: static (GX, GY, GZ) at *this* level.
    voxel_size: static float, metres per base-lattice unit.
    """

    coords: jnp.ndarray
    keys: jnp.ndarray
    features: jnp.ndarray
    valid: jnp.ndarray
    origin: jnp.ndarray
    stride: int = flax.struct.field(pytree_node=False)
    extent: Tuple[int, int, int] = flax.struct.field(pytree_node=False)
    voxel_size: float = flax.struct.field(pytree_node=False)
    # cached kernel map: (B, K, V) neighbor indices into this grid's own
    # rows for a k^3 submanifold stencil (ME's coordinate-manager kernel
    # map cache); attach_kernel_map fills it EAGERLY only for levels
    # whose convs cannot run the keyed window kernel; keyed levels keep
    # it None and carry wk_lazy_nbr instead
    nbr_idx: jnp.ndarray = None
    # keyed window-kernel geometry (ops/sparse_conv_keyed.py), attached
    # by attach_kernel_map on TPU: win_blk (B, nt*9*3) — flat [bA,bB,hb]
    # window anchors (an (nt, 9, 2) scalar-prefetch operand pads its
    # trailing dims in SMEM past the 1 MB budget, so anchors ship as a
    # flat vector); wk_qkey (B, V) shifted-safe query keys; wk_mask
    # (B, V) 27-bit offset validity; win_geom the static (tile, wb)
    win_blk: jnp.ndarray = None
    wk_qkey: jnp.ndarray = None
    wk_mask: jnp.ndarray = None
    # wk_lazy_nbr: (B, 27, V) — the exact sort-path map, built inside a
    # lax.cond ONLY when the fix-up budget overflowed (zeros otherwise);
    # consumed exclusively by the overflow fallback branch
    wk_lazy_nbr: jnp.ndarray = None
    # win_ovf: (B,) bool — bad rows exceeded the fix-up budget, use the
    # full XLA fallback; fix_rows/fix_nbr: the compacted exact fix-up
    # plan for window-undecidable rows (sparse_conv_keyed.build_fix_plan)
    win_ovf: jnp.ndarray = None
    fix_rows: jnp.ndarray = None
    fix_nbr: jnp.ndarray = None
    win_geom: Tuple[int, int] = flax.struct.field(
        pytree_node=False, default=None)

    @property
    def capacity(self) -> int:
        return self.coords.shape[1]

    def world_xyz(self):
        """(B, V, 3) world coordinates of the voxel lattice points.

        Matches reference model_vdetr.py:280 (`out.C[:, 1:] * voxel_size`):
        the *corner* (floor) lattice point, not the voxel center.
        """
        base = self.coords * self.stride + self.origin[:, None, :]
        return base.astype(jnp.float32) * self.voxel_size

    def replace_features(self, features):
        return self.replace(features=features)


def pack_keys(coords, extent):
    """coords: (..., 3) int32 -> (...,) int32 key; out-of-range -> SENTINEL."""
    gx, gy, gz = extent
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    inb = (x >= 0) & (x < gx) & (y >= 0) & (y < gy) & (z >= 0) & (z < gz)
    key = (x * gy + y) * gz + z
    return jnp.where(inb, key, KEY_SENTINEL)


def lookup_binary(keys_sorted, query_keys):
    """Binary-search `query_keys` in ascending `keys_sorted` (V,).

    Returns idx in [0, V) for hits, V for misses (use as gather index into
    a zero-padded feature table). Reference semantics for `lookup`; kept
    for tests — on TPU the log2(V) rounds of single-element gathers cost
    ~130 ns/query (230 ms for one 27-offset kernel map at V=65536)."""
    V = keys_sorted.shape[0]
    pos = jnp.searchsorted(keys_sorted, query_keys)
    pos_c = jnp.clip(pos, 0, V - 1)
    hit = (keys_sorted[pos_c] == query_keys) & (query_keys != KEY_SENTINEL)
    return jnp.where(hit, pos_c, V)


def _lookup_core(keys_sorted, query_keys):
    """Shared double-sort machinery: returns (idx, rank_left) per query.

    idx: position of the query key in keys_sorted for hits, V for misses.
    rank_left: searchsorted-left insertion position (== idx for hits).

    TPU-native formulation: merge keys and queries with ONE stable
    multi-operand sort, compute each query's insertion rank with a
    cumulative sum, detect hits with a running key maximum (ascending
    keys make `last key value at-or-before == own value` exactly the
    membership test), then restore query order with a SECOND sort by
    original position. Sorts are the one irregular primitive XLA:TPU
    runs fast (7.6 ms for 1.8M rows vs 230 ms for the equivalent
    binary-search gathers); measured ~5-10x faster end-to-end than
    `lookup_binary` and gather-free.
    """
    V = keys_sorted.shape[0]
    qshape = query_keys.shape
    qf = query_keys.reshape(-1)
    nq = qf.shape[0]
    n = V + nq
    allv = jnp.concatenate([keys_sorted, qf])
    is_query = jnp.concatenate([
        jnp.zeros((V,), jnp.int32), jnp.ones((nq,), jnp.int32)
    ])
    orig = jnp.arange(n, dtype=jnp.int32)
    # stable: an equal key sorts before its query (keys come first)
    sk, stag, sorig = jax.lax.sort((allv, is_query, orig), num_keys=1,
                                   is_stable=True)
    qcum = jnp.cumsum(stag)
    # for a query at merged position p: #keys at-or-before = p+1 - qcum[p]
    rank = orig + 1 - qcum
    lastkey = jax.lax.associative_scan(
        jnp.maximum, jnp.where(stag == 0, sk, jnp.iinfo(jnp.int32).min)
    )
    hit = (lastkey == sk) & (sk != KEY_SENTINEL)
    idx_sorted = jnp.where(hit, rank - 1, V).astype(jnp.int32)
    # keys are unique, so searchsorted-left = at-or-before minus the hit
    rank_left = (rank - hit.astype(jnp.int32)).astype(jnp.int32)
    # un-sort: order by original position (a sort, not a scatter)
    _, idx, rl = jax.lax.sort((sorig, idx_sorted, rank_left), num_keys=1)
    return idx[V:].reshape(qshape), rl[V:].reshape(qshape)


def _fast_rank_core(keys_sorted, query_keys, wb: int = 128):
    """Exact searchsorted-left ranks via block summaries: one broadcast
    compare against the nb = V/wb per-block LAST keys (fused into a
    reduce by XLA — never materialized), one (nq, wb) block-row gather,
    one in-block compare. Replaces the double-sort `_lookup_core` on
    the hot paths: the sort processes V + nq rows through TWO stable
    multi-operand sorts (~2 ms per 100k rows), while this is ~nq/wb
    512-byte row gathers plus pure VPU compares — measured well under
    1 ms for every kernel-map/anchor/fix-plan shape.

    Returns (rank (nq,), rows (nq, wb)): rows is query q's candidate
    block (if q is present in keys_sorted it lies in this block —
    all earlier blocks end below q), so callers get membership via
    `(rows == q).any()` for free.
    """
    V = keys_sorted.shape[0]
    nb = -(-V // wb)
    pad = nb * wb - V
    keys_p = keys_sorted if pad == 0 else jnp.concatenate(
        [keys_sorted, jnp.full((pad,), KEY_SENTINEL, jnp.int32)])
    blocks = keys_p.reshape(nb, wb)
    bounds = blocks[:, -1]                               # (nb,)
    qshape = query_keys.shape
    q = query_keys.reshape(-1)[:, None]                  # (nq, 1)
    blk = jnp.sum((bounds[None, :] < q).astype(jnp.int32), axis=1)
    blk = jnp.minimum(blk, nb - 1)
    rows = blocks[blk]                                   # (nq, wb) gather
    rank = blk * wb + jnp.sum((rows < q).astype(jnp.int32), axis=1)
    return rank.astype(jnp.int32).reshape(qshape), rows, q


def lookup(keys_sorted, query_keys):
    """Sorted-set membership (same contract as `lookup_binary`: idx in
    [0, V) for hits, V for misses). Block-summary fast path; keys are
    UNIQUE (voxel keys), so a hit's index == its searchsorted-left
    rank."""
    V = keys_sorted.shape[0]
    rank, rows, q = _fast_rank_core(keys_sorted, query_keys)
    hit = (rows == q).any(axis=1).reshape(query_keys.shape)
    hit = hit & (query_keys != KEY_SENTINEL)
    return jnp.where(hit, rank, V)


def lookup_rank(keys_sorted, query_keys):
    """searchsorted-left positions of query_keys in keys_sorted
    (block-summary fast path; `lookup_sort`/`lookup_rank_sort` keep the
    double-sort formulation for A/B and tests)."""
    return _fast_rank_core(keys_sorted, query_keys)[0]


def lookup_sort(keys_sorted, query_keys):
    """Double-sort membership lookup (see _lookup_core)."""
    return _lookup_core(keys_sorted, query_keys)[0]


def lookup_rank_sort(keys_sorted, query_keys):
    """Double-sort searchsorted-left (see _lookup_core)."""
    return _lookup_core(keys_sorted, query_keys)[1]


def unpack_keys(keys, extent):
    """Inverse of pack_keys for in-range keys: (...,) int32 -> (..., 3).
    SENTINEL/invalid rows must be masked by the caller."""
    _, gy, gz = extent
    z = keys % gz
    y = (keys // gz) % gy
    x = keys // (gy * gz)
    return jnp.stack([x, y, z], axis=-1)


def _compact_unique(keys, payload, capacity):
    """Sort keys, keep the first row of each unique key, compact the
    unique rows to the front in ascending key order.

    keys: (N,) int32 (invalid rows must already be SENTINEL).
    payload: tuple of (N,) or (N, C) arrays carried along.
    Returns (out_keys (capacity,), payload_out tuple, count).

    TPU formulation: everything is TWO stable multi-operand sorts —
    (1) sort by key (first occurrence of a duplicate stays first, the
    MinkowskiEngine unique-representative rule), (2) sort by the
    head-flag to compact unique rows to the front while preserving key
    order. No argsort-then-gather and no scatter: per-row gathers and
    scatters run at ~20 GB/s / ~80 M rows/s on this chip
    (tools/gather_micro.py) while multi-operand sorts stream on the VPU;
    payload coords are not even carried — callers recompute them from
    the packed key via unpack_keys."""
    N = keys.shape[0]
    # flatten (N, C) payloads into C separate (N,) operands
    flat_ops = []
    specs = []  # (ndim, C, dtype) to rebuild
    for arr in payload:
        if arr.ndim == 1:
            flat_ops.append(arr)
            specs.append(None)
        else:
            C = arr.shape[1]
            specs.append(C)
            for c in range(C):
                flat_ops.append(arr[:, c])
    sorted_all = jax.lax.sort((keys, *flat_ops), num_keys=1, is_stable=True)
    ks = sorted_all[0]
    head = (ks != KEY_SENTINEL) & jnp.concatenate(
        [jnp.ones((1,), bool), ks[1:] != ks[:-1]]
    )
    # compact: stable sort by (1 - head) keeps heads first, key-ordered
    flag = 1 - head.astype(jnp.int32)
    sorted2 = jax.lax.sort((flag, ks, *sorted_all[1:]), num_keys=1,
                           is_stable=True)
    count = jnp.minimum(head.sum(), capacity)
    if capacity > N:  # static: pad before slicing
        pad = capacity - N
        sorted2 = tuple(
            jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) for a in sorted2
        )
    valid = jnp.arange(capacity, dtype=jnp.int32) < count
    out_keys = jnp.where(valid, sorted2[1][:capacity], KEY_SENTINEL)
    outs = []
    pos = 2
    for arr, spec in zip(payload, specs):
        if spec is None:
            col = jnp.where(valid, sorted2[pos][:capacity], 0)
            pos += 1
            outs.append(col.astype(arr.dtype))
        else:
            cols = []
            for _ in range(spec):
                cols.append(jnp.where(valid, sorted2[pos][:capacity], 0))
                pos += 1
            outs.append(jnp.stack(cols, axis=-1).astype(arr.dtype))
    return out_keys, tuple(outs), count


def _voxelize_single(points, feats, point_valid, voxel_size, extent,
                     capacity, align_stride):
    """points: (N, 3); feats: (N, C); point_valid: (N,) bool."""
    coords_raw = jnp.floor(points / voxel_size).astype(jnp.int32)
    big = jnp.int32(1 << 30)
    masked = jnp.where(point_valid[:, None], coords_raw, big)
    mn = masked.min(axis=0)
    origin = (mn // align_stride) * align_stride  # floor-div: aligns downward
    origin = jnp.where(point_valid.any(), origin, jnp.zeros((3,), jnp.int32))
    c = coords_raw - origin[None, :]
    keys = jnp.where(point_valid, pack_keys(c, extent), KEY_SENTINEL)
    out_keys, (out_feats,), count = _compact_unique(keys, (feats,), capacity)
    valid = out_keys != KEY_SENTINEL
    out_coords = jnp.where(valid[:, None],
                           unpack_keys(jnp.where(valid, out_keys, 0), extent),
                           0)
    return out_keys, out_coords, out_feats, valid, origin


def voxelize(points, feats, point_valid, voxel_size: float,
             capacity: int, extent=DEFAULT_EXTENT, align_stride: int = 32):
    """Batched voxelization.

    points: (B, N, 3) world metres; feats: (B, N, C); point_valid: (B, N).
    Duplicate points in one voxel: the first (lowest original index) wins,
    mirroring MinkowskiEngine's unique-representative quantization.
    Returns a stride-1 VoxelGrid.
    """
    fn = functools.partial(
        _voxelize_single,
        voxel_size=voxel_size,
        extent=extent,
        capacity=capacity,
        align_stride=align_stride,
    )
    keys, coords, features, valid, origin = jax.vmap(fn)(
        points, feats, point_valid
    )
    return VoxelGrid(
        coords=coords,
        keys=keys,
        features=features,
        valid=valid,
        origin=origin,
        stride=1,
        extent=extent,
        voxel_size=voxel_size,
    )


def downsample_grid(grid: VoxelGrid, out_capacity: int) -> VoxelGrid:
    """Coordinate-only stride-2 downsample: child coords = floor(c / 2),
    dedup'd. Features are zero-initialized (filled by the strided conv)."""
    gx, gy, gz = grid.extent
    child_extent = ((gx + 1) // 2, (gy + 1) // 2, (gz + 1) // 2)

    def one(coords, valid):
        cc = coords // 2
        keys = jnp.where(valid, pack_keys(cc, child_extent), KEY_SENTINEL)
        out_keys, _, _ = _compact_unique(keys, (), out_capacity)
        ov = out_keys != KEY_SENTINEL
        out_coords = jnp.where(
            ov[:, None],
            unpack_keys(jnp.where(ov, out_keys, 0), child_extent), 0)
        return out_keys, out_coords, ov

    keys, coords, valid = jax.vmap(one)(grid.coords, grid.valid)
    C = grid.features.shape[-1]
    return VoxelGrid(
        coords=coords,
        keys=keys,
        features=jnp.zeros((coords.shape[0], out_capacity, C),
                           grid.features.dtype),
        valid=valid,
        origin=grid.origin,
        stride=grid.stride * 2,
        extent=child_extent,
        voxel_size=grid.voxel_size,
    )


def upsample_candidates(grid: VoxelGrid, out_capacity: int) -> VoxelGrid:
    """Generative stride-/2 upsample: every parent voxel proposes its 8
    children (MinkowskiGenerativeConvolutionTranspose coordinate semantics,
    reference model_vdetr.py:163-176 when woexpand_conv=False)."""
    gx, gy, gz = grid.extent
    fine_extent = (gx * 2, gy * 2, gz * 2)
    offs = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32,
    )

    def one(coords, valid):
        cand = (coords[:, None, :] * 2 + offs[None, :, :]).reshape(-1, 3)
        v = jnp.repeat(valid, 8)
        keys = jnp.where(v, pack_keys(cand, fine_extent), KEY_SENTINEL)
        out_keys, _, _ = _compact_unique(keys, (), out_capacity)
        ov = out_keys != KEY_SENTINEL
        out_coords = jnp.where(
            ov[:, None],
            unpack_keys(jnp.where(ov, out_keys, 0), fine_extent), 0)
        return out_keys, out_coords, ov

    keys, coords, valid = jax.vmap(one)(grid.coords, grid.valid)
    C = grid.features.shape[-1]
    return VoxelGrid(
        coords=coords,
        keys=keys,
        features=jnp.zeros((coords.shape[0], out_capacity, C),
                           grid.features.dtype),
        valid=valid,
        origin=grid.origin,
        stride=grid.stride // 2,
        extent=fine_extent,
        voxel_size=grid.voxel_size,
    )
