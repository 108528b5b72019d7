"""Sparse 3D convolution primitives over `VoxelGrid`s.

TPU-native re-expression of MinkowskiEngine convolutions (reference
models/mink_resnet.py, models/model_vdetr.py:139-193): for every kernel
offset, neighbor indices are resolved by binary search in the sorted voxel
keys, features are gathered (misses hit a zero pad row) and contracted with
that offset's weight matrix on the MXU. No hash tables, no host sync; the
whole backbone stays inside one jit.

Weight layout is (K, C_in, C_out) with offsets enumerated
x-major/z-fastest (`_offsets`), mirroring MinkowskiEngine's kernel
ordering so checkpoints can port weight-for-weight.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from vdetr_tpu.ops.voxelize import (
    KEY_SENTINEL,
    VoxelGrid,
    downsample_grid,
    lookup,
    lookup_rank,
    lookup_rank_sort,
    pack_keys,
    upsample_candidates,
)
from vdetr_tpu.ops import sparse_conv_keyed as _skc

# window-kernel geometry (ops/sparse_conv_keyed.py): output tile rows
# and window block rows, dual-cluster anchoring. With tile == wb each
# neighbor-rank cluster of a tile fits one 2*wb window pair, and the
# second pair absorbs x-slice-boundary tiles (the structural overflow
# that previously forced whole-conv XLA fallback on real scans);
# leftover >= 3-cluster rows are patched exactly (budgeted) or the
# whole conv falls back exactly via lax.cond.
_WINDOW_CHANNELS = (64, 128, 256)


def window_geometry(V: int):
    """(tile, wb) for a level of capacity V; None if ineligible."""
    if V % 128:
        return None
    return (128, 128)


def _offsets(kernel_size: int) -> Tuple[Tuple[int, int, int], ...]:
    """Kernel offsets for an odd kernel, z-fastest: (-r..r) per axis."""
    r = kernel_size // 2
    return tuple(
        (i, j, k)
        for i in range(-r, r + 1)
        for j in range(-r, r + 1)
        for k in range(-r, r + 1)
    )


def _gather_matmul(in_feats, nbr_idx, weights, compute_dtype=None):
    """Shared inner loop: for each offset k, gather neighbor features and
    accumulate `x_k @ W[k]`.

    in_feats: (V_in, C_in); nbr_idx: (K, V_out) indices into in_feats
    rows (V_in = miss, hits the zero pad row); weights: (K, C_in, C_out).
    Returns (V_out, C_out).
    """
    V_in, C_in = in_feats.shape
    K, _, C_out = weights.shape
    feats_ext = jnp.concatenate(
        [in_feats, jnp.zeros((1, C_in), in_feats.dtype)], axis=0
    )
    if compute_dtype is not None:
        feats_ext = feats_ext.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    out0 = jnp.zeros((nbr_idx.shape[1], C_out), jnp.float32)

    # scan over kernel offsets: 27x smaller graph than unrolling (the
    # whole ResNet has ~900 offset steps; unrolled it dominates XLA
    # compile time), identical compute
    def step(acc, inputs):
        idx, w = inputs
        x = feats_ext[idx]
        acc = acc + jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)
        return acc, None

    out, _ = jax.lax.scan(step, out0, (nbr_idx, weights))
    return out


def _zrun_neighbors(in_keys, q0, valid, extent, r: int,
                    rank_fn=lookup_rank):
    """(K, V) neighbor indices for the k^3 stencil centered at integer
    coords q0 (input-lattice units), exploiting z-adjacency of the sorted
    packed keys.

    For a fixed (dx, dy) the three dz in {-1,0,1} expected keys are
    CONSECUTIVE integers (z-fastest packing), so any key in the interval
    [min_valid, min_valid+2] IS one of the expected keys: one
    searchsorted-left rank per (dx, dy) group plus three single-int32
    gathers replaces per-offset membership lookups — the merged
    double-sort then processes (2r+1)^2 * V queries instead of
    (2r+1)^3 * V (3x fewer sort rows, the dominant kernel-map cost).
    Offset order matches _offsets: x-major, z-fastest.
    """
    V_in = in_keys.shape[0]
    zoffs = list(range(-r, r + 1))
    w = len(zoffs)
    ek_groups = []
    for dx in zoffs:
        for dy in zoffs:
            row = []
            for dz in zoffs:
                q = q0 + jnp.asarray([dx, dy, dz], jnp.int32)
                k = pack_keys(q, extent)
                row.append(jnp.where(valid, k, KEY_SENTINEL))
            ek_groups.append(jnp.stack(row))
    ek = jnp.stack(ek_groups)                  # (G, w, V) consecutive keys
    qmin = ek.min(axis=1)                      # (G, V): min valid expected
    base = rank_fn(in_keys, qmin)              # (G, V)
    keys_ext = jnp.concatenate(
        [in_keys, jnp.full((w,), KEY_SENTINEL, jnp.int32)])
    wk = [keys_ext[jnp.clip(base + s, 0, V_in + w - 1)] for s in range(w)]
    idx_e = []
    for e in range(w):
        cand = jnp.full(base.shape, V_in, jnp.int32)
        for s in range(w):
            m = (wk[s] == ek[:, e]) & (ek[:, e] != KEY_SENTINEL)
            cand = jnp.where(m, base + s, cand)
        idx_e.append(cand)
    out = jnp.stack(idx_e, axis=1)             # (G, w, V)
    return out.reshape(len(ek_groups) * w, -1)


def _map_kernel_eligible(kernel_size: int, v_table: int, v_query: int,
                         interpret: bool) -> bool:
    import os as _os

    if _os.environ.get("VDETR_DISABLE_MAP_KERNEL"):
        return False  # A/B switch: force the double-sort path
    if kernel_size != 3 or v_table % 128 or v_query % 128:
        return False
    # small levels lose: the per-tile fixed cost (anchor lookup + 9 group
    # window passes) stops amortizing below ~16k queries — measured on
    # chip 10.1 ms kernel vs 7.6 ms double-sort at V=8k, while 16k/32k/
    # 65k all win (tools/map_kernel_micro.py); interpret mode is only
    # used by parity tests, keep those exercising the kernel at any size
    if not interpret and v_query < 16384:
        return False
    return interpret or jax.default_backend() in ("tpu", "axon")


def _stencil_map_or_fallback(in_keys, q0, qvalid, extent, interpret,
                             fallback):
    """Map kernel with exact lax.cond fallback: undecidable rows beyond
    the fix-up budget (not observed on surface scans; the budget is
    V/16 rows) route the whole map through `fallback` (the double-sort
    path), so the result is always exact."""
    from vdetr_tpu.ops import map_kernel as _mk

    nbr, n_unpatched = _mk.stencil_map(in_keys, q0, qvalid, extent,
                                       interpret=interpret)
    return jax.lax.cond(n_unpatched > 0,
                        lambda _: fallback(),
                        lambda _: nbr, None)


def kernel_map(grid: VoxelGrid, kernel_size: int = 3,
               window_interpret: bool = False) -> jnp.ndarray:
    """(B, K, V) neighbor indices for a submanifold k^3 stencil on
    `grid`'s own sites. On TPU this runs the windowed Mosaic map kernel
    (ops/map_kernel.py: per-tile key-window compares, exact budgeted
    patch); elsewhere one searchsorted pass per (dx, dy) offset group
    with the z-offsets derived from sorted-key adjacency
    (_zrun_neighbors)."""
    if kernel_size == 1:  # submanifold identity stencil: no lookup at all
        B, V = grid.keys.shape
        idx = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (B, V))
        return jnp.where(grid.valid, idx, V)[:, None, :]
    r = kernel_size // 2

    def one(coords, keys, valid):
        return _zrun_neighbors(keys, coords, valid, grid.extent, r)

    def sort_path():
        return jax.vmap(one)(grid.coords, grid.keys, grid.valid)

    V = grid.keys.shape[1]
    if _map_kernel_eligible(kernel_size, V, V, window_interpret):
        return _stencil_map_or_fallback(grid.keys, grid.coords,
                                        grid.valid, grid.extent,
                                        window_interpret, sort_path)
    return sort_path()


def level_needs_eager_map(c_in: int, c_out: int) -> bool:
    """True when a k3 conv with these channel widths cannot run the
    keyed window kernel (so its level must attach a real kernel map for
    the XLA gather path; see the eligibility gates in sparse_conv)."""
    full = c_in in _WINDOW_CHANNELS and c_out in _WINDOW_CHANNELS
    fwd = _skc.keyed_fwd_ok(c_in, c_out)
    return not (full or fwd)


def _window_eligible(kernel_size: int, interpret: bool) -> bool:
    import os as _os

    import jax as _jax

    if _os.environ.get("VDETR_DISABLE_WINDOW_KERNEL"):
        return False  # A/B switch: force the XLA gather path
    return kernel_size == 3 and (
        interpret or _jax.default_backend() in ("tpu", "axon")
    )


def attach_kernel_map(grid: VoxelGrid, kernel_size: int = 3,
                      window_interpret: bool = False,
                      eager_map: bool = False) -> VoxelGrid:
    """Attach conv lookup structure to the grid (MinkowskiEngine's
    coordinate-manager kernel-map cache, done the XLA way).

    On TPU this attaches the KEYED window geometry
    (ops/sparse_conv_keyed.py: anchors + validity + exact fix-up plan)
    — no (27, V) kernel map is built at all; the exact sort-path map is
    materialized lazily inside a lax.cond only if the fix-up budget
    overflows (not observed on surface scans). Every stride-1 conv over
    these sites then builds its one-hot row selection in-kernel from
    the sorted keys.

    eager_map=True additionally builds the real kernel map up front —
    required when some conv on this level cannot run the keyed kernel
    (channel widths outside the window set, e.g. the 512-channel stage)
    and will take the XLA gather path unconditionally."""
    V = grid.keys.shape[1]
    geom = window_geometry(V)
    if not (_window_eligible(kernel_size, window_interpret) and geom):
        nbr = kernel_map(grid, kernel_size,
                         window_interpret=window_interpret)
        return grid.replace(nbr_idx=nbr)
    tile, wb = geom
    g = jax.vmap(
        lambda k, q, v: _skc.conv_window_geometry(k, q, v, grid.extent,
                                                  tile, wb)
    )(grid.keys, grid.coords, grid.valid)
    budget = max(tile, V // 16)
    rows, fnbr, ovf = jax.vmap(
        lambda k, b, q, v: _skc.build_fix_plan(k, b, q, v, grid.extent,
                                               budget)
    )(grid.keys, g["bad"], grid.coords, grid.valid)
    out = grid.replace(wk_qkey=g["qkeym"], wk_mask=g["mask"],
                       win_blk=g["blk"], win_ovf=ovf, fix_rows=rows,
                       fix_nbr=fnbr, win_geom=(tile, wb))
    if eager_map:
        nbr = kernel_map(grid, kernel_size,
                         window_interpret=window_interpret)
        return out.replace(nbr_idx=nbr)

    # lazy exact fallback: the sort-path map is traced into the cond
    # branch but only EXECUTED when the budget overflowed. Uses the
    # double-sort rank on purpose: the fast block-gather rank would
    # reserve a (9V, wb) transient in the branch's buffer assignment
    # even when never executed, and fallback speed does not matter.
    def sort_path(_):
        return jax.vmap(
            lambda c, k, v: _zrun_neighbors(k, c, v, grid.extent, 1,
                                            rank_fn=lookup_rank_sort)
        )(grid.coords, grid.keys, grid.valid)

    B = grid.keys.shape[0]
    lazy = jax.lax.cond(
        ovf.any(), sort_path,
        lambda _: jnp.zeros((B, kernel_size ** 3, V), jnp.int32), None)
    return out.replace(wk_lazy_nbr=lazy)


def _apply_fixup(out, feats, fix_rows, fix_nbr, weights, compute_dtype):
    """Overwrite the window-kernel output at the fix-up rows with the
    exact 27-offset gather conv (bit-identical to the XLA path)."""
    fixed = jax.vmap(
        lambda f, i: _gather_matmul(f, i, weights, compute_dtype)
    )(feats, fix_nbr)
    return jax.vmap(
        lambda o, r, x: o.at[r].set(x, mode="drop")
    )(out, fix_rows, fixed)


def sparse_conv(grid: VoxelGrid, weights, kernel_size: int = 3,
                compute_dtype=None) -> VoxelGrid:
    """Submanifold (stride-1) sparse conv: output sites == input sites.

    weights: (kernel_size^3, C_in, C_out). Uses the grid's cached kernel
    map when present (attach_kernel_map); otherwise builds one on the fly.

    The gather+matmul is rematerialized: without jax.checkpoint the
    scan's backward stores the gathered (V, C_in) features for all K
    offsets of every conv (~11 GB across the ResNet34 at 131k-voxel
    capacity — measured via XLA memory analysis; it OOMed the v5e
    worker). Storing only the op inputs and re-gathering in backward
    costs one extra pass.
    """
    k3 = kernel_size ** 3

    @jax.checkpoint
    def run(feats, nbr, weights):
        return jax.vmap(
            lambda f, i: _gather_matmul(f, i, weights, compute_dtype)
        )(feats, nbr)

    C_in, C_out = weights.shape[1], weights.shape[2]
    # VMEM budget: the kernel holds the full bf16 weight tensor resident,
    # capped at 8 MB (27*512*512*2 = 14 MB left only ~400 KB of the
    # 16 MB scoped limit and OOMed depending on surrounding fusion).
    # Wider convs (the stage-4 512x512s) now split the contraction over
    # C_in inside keyed_conv — two passes of the proven 256->512 shape —
    # so keyed_fwd_ok admits them (round 5, VERDICT item 2).
    # C_in >= 64 floor (as in sparse_conv_down): sub-lane channel widths
    # in the Mosaic kernel are a compile risk and waste the MXU.
    # keyed_bwd_ok additionally requires the flipped dFeats replay and
    # the (group-split) dW accumulator to fit: when it holds, the conv
    # takes the FULLY keyed backward (no kernel map ever built) — since
    # round 5 that includes the stage-4 512s, so training no longer
    # rebuilds their (27, V) neighbor maps each step (VERDICT item 4).
    full_kernel = _skc.keyed_bwd_ok(C_in, C_out)
    fwd_kernel = _skc.keyed_fwd_ok(C_in, C_out)
    if (grid.wk_qkey is not None and kernel_size == 3
            and (full_kernel or fwd_kernel)):
        interp = jax.default_backend() not in ("tpu", "axon")
        tile, wb = grid.win_geom
        shifts = jnp.asarray(_skc._group_shifts(grid.extent), jnp.int32)
        fb_nbr = (grid.nbr_idx if grid.nbr_idx is not None
                  else grid.wk_lazy_nbr)

        def kernel_path(feats):
            if full_kernel:
                o = _skc.keyed_conv_ad(
                    feats, grid.keys, grid.wk_qkey, grid.wk_mask,
                    grid.win_blk, shifts, weights,
                    grid.fix_rows, grid.fix_nbr, tile, wb, interp)
            else:
                # 256->512 convs: kernel forward, lazily-mapped XLA
                # gather backward (the dW kernel's f32 scratch would
                # not fit past 27*256*256*4)
                o = _skc.keyed_conv_fwdk(
                    feats, grid.keys, grid.wk_qkey, grid.wk_mask,
                    grid.win_blk, shifts, weights,
                    grid.coords, grid.valid, grid.extent,
                    tile, wb, interp, 1)
            return _apply_fixup(o, feats, grid.fix_rows, grid.fix_nbr,
                                weights, compute_dtype)

        def xla_path(feats):
            return run(feats, fb_nbr, weights)

        out = jax.lax.cond(grid.win_ovf.any(), xla_path, kernel_path,
                           grid.features)
    else:
        if grid.nbr_idx is not None and grid.nbr_idx.shape[1] == k3:
            nbr = grid.nbr_idx
        else:
            nbr = kernel_map(grid, kernel_size)
        out = run(grid.features, nbr, weights)
    out = out * grid.valid[..., None]
    return grid.replace(features=out)


def sparse_conv_down(grid: VoxelGrid, weights, out_capacity: int = 0,
                     kernel_size: int = 3, compute_dtype=None,
                     out_grid: VoxelGrid = None,
                     window_interpret: bool = False) -> VoxelGrid:
    """Stride-2 sparse conv. Output sites = unique(floor(c/2)); for output
    o the input neighbors are 2*o + d, d in the kernel region (kernel 3)
    or exactly 2*o (kernel 1, the ResNet downsample branch).

    Pass `out_grid` (from downsample_grid, possibly with a kernel map
    attached) to share the site computation between the block's strided
    conv and its 1x1 downsample branch."""
    if out_grid is None:
        out_grid = downsample_grid(grid, out_capacity)
    if kernel_size == 1:
        def one_map(out_coords, out_valid, in_keys):
            qkeys = pack_keys(out_coords * 2, grid.extent)
            qkeys = jnp.where(out_valid, qkeys, KEY_SENTINEL)
            return lookup(in_keys, qkeys)[None, :]
        nbr = jax.vmap(one_map)(out_grid.coords, out_grid.valid,
                                grid.keys)
    else:
        r = kernel_size // 2

        def sort_path(_=None, rank_fn=lookup_rank):
            return jax.vmap(
                lambda oc, ov, ik: _zrun_neighbors(ik, oc * 2, ov,
                                                   grid.extent, r,
                                                   rank_fn=rank_fn)
            )(out_grid.coords, out_grid.valid, grid.keys)

        @jax.checkpoint  # see sparse_conv: avoid storing per-offset gathers
        def run(in_feats, nbr, weights):
            return jax.vmap(
                lambda f, i: _gather_matmul(f, i, weights, compute_dtype)
            )(in_feats, nbr)

        C_in, C_out = weights.shape[1], weights.shape[2]
        V_out = out_grid.keys.shape[1]
        V_in_ = grid.keys.shape[1]
        geom = window_geometry(V_out)
        # small-C_in convs (the 3..6-channel STEM) run the keyed kernel
        # with channels zero-padded to 32: (wb, 32) windows stay
        # contiguous 8 KB DMA slabs and the s-build (which dominates at
        # these widths) is channel-independent. The stem's kernel map —
        # the single largest map build (table 131k, queries 65k) — then
        # disappears from the eval forward entirely.
        c_pad = 32 if C_in < 32 else None
        fits = (_skc.keyed_fwd_ok(C_in, C_out)
                or (c_pad is not None and C_out >= 64
                    and c_pad * C_out * 27 * 2 <= _skc.WEIGHT_VMEM_CAP))
        if geom and fits and _window_eligible(3, window_interpret):
            # stride-2 conv via the KEYED window kernel: queries are
            # 2*out_coords + d in the INPUT lattice — monotone in the
            # sorted output sites, so the same window anchoring applies.
            # Output sites != input sites means the flipped-weights
            # dFeats identity does not hold: backward rebuilds the map
            # lazily and replays the XLA gather vjp (keyed_conv_fwdk) —
            # eval never materializes a kernel map at all.
            tile, wb = geom
            interp = jax.default_backend() not in ("tpu", "axon")
            q0 = out_grid.coords * 2
            g = jax.vmap(
                lambda k, q, v: _skc.conv_window_geometry(
                    k, q, v, grid.extent, tile, wb)
            )(grid.keys, q0, out_grid.valid)
            budget = max(tile, V_out // 16)
            rows, fnbr, ovf = jax.vmap(
                lambda k, b, q, v: _skc.build_fix_plan(
                    k, b, q, v, grid.extent, budget)
            )(grid.keys, g["bad"], q0, out_grid.valid)
            shifts = jnp.asarray(_skc._group_shifts(grid.extent),
                                 jnp.int32)

            def kernel_path(feats):
                f_in, w_in = feats, weights
                if c_pad:
                    f_in = jnp.pad(feats, ((0, 0), (0, 0),
                                           (0, c_pad - C_in)))
                    w_in = jnp.pad(weights, ((0, 0), (0, c_pad - C_in),
                                             (0, 0)))
                o = _skc.keyed_conv_fwdk(
                    f_in, grid.keys, g["qkeym"], g["mask"], g["blk"],
                    shifts, w_in, q0, out_grid.valid, grid.extent,
                    tile, wb, interp, r)
                return _apply_fixup(o, feats, rows, fnbr, weights,
                                    compute_dtype)

            def xla_path(feats):
                # map built inside the branch: traced always, executed
                # only on fix-budget overflow (double-sort rank: see
                # the lazy-fallback note in attach_kernel_map)
                return run(feats, sort_path(rank_fn=lookup_rank_sort),
                           weights)

            out = jax.lax.cond(ovf.any(), xla_path, kernel_path,
                               grid.features)
        else:
            # non-keyed strided conv (e.g. the 3-channel stem): eager
            # map via the windowed map kernel when eligible
            if _map_kernel_eligible(kernel_size, V_in_, V_out, False):
                nbr = _stencil_map_or_fallback(
                    grid.keys, out_grid.coords * 2, out_grid.valid,
                    grid.extent, False, sort_path)
            else:
                nbr = sort_path()
            out = run(grid.features, nbr, weights)
        out = out * out_grid.valid[..., None]
        return out_grid.replace(features=out)

    @jax.checkpoint  # see sparse_conv: avoid storing per-offset gathers
    def run1(in_feats, nbr, weights):
        return jax.vmap(
            lambda f, i: _gather_matmul(f, i, weights, compute_dtype)
        )(in_feats, nbr)

    out = run1(grid.features, nbr, weights)
    out = out * out_grid.valid[..., None]
    return out_grid.replace(features=out)


def sparse_conv_transpose(coarse: VoxelGrid, fine_sites: VoxelGrid, weights,
                          compute_dtype=None) -> VoxelGrid:
    """Kernel-2 stride-2 transpose conv evaluated at given fine sites
    (the FPN skip grid) — MinkowskiConvolutionTranspose semantics where the
    output coordinate map is the cached finer-level map
    (reference model_vdetr.py:146-161, use at :266-278).

    Each fine site f has exactly one coarse contributor floor(f/2); the
    weight slot is the offset f - 2*floor(f/2) in {0,1}^3 (z-fastest order
    to match the (8, C_in, C_out) kernel layout).
    """
    @jax.checkpoint  # see sparse_conv: avoid storing the 8 masked copies
    def run(f_coords_b, f_valid_b, c_keys_b, c_feats_b, weights):
        def one(f_coords, f_valid, c_keys, c_feats):
            parent = f_coords // 2
            pkeys = pack_keys(parent, coarse.extent)
            pkeys = jnp.where(f_valid, pkeys, KEY_SENTINEL)
            idx = lookup(c_keys, pkeys)
            C_in = c_feats.shape[-1]
            feats_ext = jnp.concatenate(
                [c_feats, jnp.zeros((1, C_in), c_feats.dtype)], axis=0
            )
            x = feats_ext[idx]  # (V_f, C_in)
            rel = f_coords - parent * 2  # (V_f, 3) in {0,1}
            k = (rel[:, 0] * 2 + rel[:, 1]) * 2 + rel[:, 2]  # (V_f,)
            w = weights
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
                w = w.astype(compute_dtype)
            out = jnp.zeros((x.shape[0], w.shape[-1]), x.dtype)
            # one masked matmul per weight slot: avoids gathering a
            # per-site (C_in, C_out) weight tensor
            for kk in range(8):
                xm = jnp.where((k == kk)[:, None], x, 0)
                out = out + jax.lax.dot_general(
                    xm, w[kk], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return out.astype(jnp.float32)

        return jax.vmap(one)(f_coords_b, f_valid_b, c_keys_b, c_feats_b)

    out = run(fine_sites.coords, fine_sites.valid, coarse.keys,
              coarse.features, weights)
    out = out * fine_sites.valid[..., None]
    return fine_sites.replace(features=out)


def sparse_conv_transpose_generative(coarse: VoxelGrid, weights,
                                     out_capacity: int,
                                     compute_dtype=None) -> VoxelGrid:
    """Kernel-2 stride-2 generative transpose conv: output sites are all
    8 children of every coarse voxel (MinkowskiGenerativeConvolutionTranspose,
    reference model_vdetr.py:163-176)."""
    fine = upsample_candidates(coarse, out_capacity)
    return sparse_conv_transpose(coarse, fine, weights,
                                 compute_dtype=compute_dtype)
