"""Exact linear assignment (Hungarian matching) on device.

The reference matcher ships every cost matrix to the host and loops over
the batch calling scipy (criterion.py:201-222) — a GPU->CPU sync inside
the train step. Here the classic Jonker-Volgenant shortest-augmenting-path
algorithm (the same one scipy implements) runs under jit with
`lax.while_loop`s, so matching stays on the TPU inside the compiled step.

`hungarian(cost, n_valid_rows)` solves min-cost assignment of each of the
first `n_valid_rows` rows to a distinct column (rows <= cols). Rows beyond
`n_valid_rows` are skipped and get -1. Results are exact (same optimum as
scipy; tie-broken possibly differently).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(jnp.inf)


def _solve_single(cost, n_valid):
    """cost: (n, m) float32, n <= m; n_valid: scalar int."""
    n, m = cost.shape
    u = jnp.zeros((n,), jnp.float32)
    v = jnp.zeros((m,), jnp.float32)
    row4col = jnp.full((m,), -1, jnp.int32)
    col4row = jnp.full((n,), -1, jnp.int32)

    def assign_row(cur_row, carry):
        u, v, row4col, col4row = carry

        def do(carry):
            u, v, row4col, col4row = carry
            shortest = jnp.full((m,), INF)
            path = jnp.full((m,), -1, jnp.int32)
            scanned_c = jnp.zeros((m,), bool)
            scanned_r = jnp.zeros((n,), bool)

            def dijkstra_cond(state):
                _, _, _, _, _, sink, _ = state
                return sink < 0

            def dijkstra_body(state):
                shortest, path, scanned_c, scanned_r, i, sink, minval = state
                scanned_r = scanned_r.at[i].set(True)
                red = minval + cost[i] - u[i] - v
                better = (~scanned_c) & (red < shortest)
                shortest = jnp.where(better, red, shortest)
                path = jnp.where(better, i, path)
                masked = jnp.where(scanned_c, INF, shortest)
                j = jnp.argmin(masked).astype(jnp.int32)
                minval = masked[j]
                scanned_c = scanned_c.at[j].set(True)
                nxt = row4col[j]
                sink = jnp.where(nxt < 0, j, jnp.int32(-1))
                i = jnp.where(nxt < 0, i, nxt)
                return shortest, path, scanned_c, scanned_r, i, sink, minval

            shortest, path, scanned_c, scanned_r, _, sink, minval = (
                jax.lax.while_loop(
                    dijkstra_cond,
                    dijkstra_body,
                    (shortest, path, scanned_c, scanned_r,
                     cur_row.astype(jnp.int32), jnp.int32(-1),
                     jnp.float32(0.0)),
                )
            )

            # potential updates
            u = u.at[cur_row].add(minval)
            other = scanned_r & (jnp.arange(n) != cur_row)
            shortest_of_row = jnp.where(
                col4row >= 0, shortest[jnp.clip(col4row, 0)], 0.0
            )
            u = jnp.where(other, u + minval - shortest_of_row, u)
            v = jnp.where(scanned_c, v - (minval - shortest), v)

            # augment: walk predecessors from sink back to cur_row
            def aug_cond(state):
                _, _, j, done = state
                return ~done

            def aug_body(state):
                row4col, col4row, j, _ = state
                i = path[j]
                row4col = row4col.at[j].set(i)
                jnext = col4row[i]
                col4row = col4row.at[i].set(j)
                done = i == cur_row
                return row4col, col4row, jnext, done

            row4col, col4row, _, _ = jax.lax.while_loop(
                aug_cond, aug_body, (row4col, col4row, sink, False)
            )
            return u, v, row4col, col4row

        return jax.lax.cond(cur_row < n_valid, do, lambda c: c,
                            (u, v, row4col, col4row))

    u, v, row4col, col4row = jax.lax.fori_loop(
        0, n, assign_row, (u, v, row4col, col4row)
    )
    return col4row


def hungarian(cost, n_valid):
    """Batched exact LAP.

    cost: (B, n, m) float32 with n <= m; n_valid: (B,) int — only the
    first n_valid[b] rows are assigned. Returns col4row (B, n) int32 with
    -1 for skipped rows.
    """
    assert cost.shape[1] <= cost.shape[2], "need rows <= cols; transpose"
    return jax.vmap(_solve_single)(cost.astype(jnp.float32), n_valid)


# --------------------------------------------------------------------------
# Auction assignment: the TPU-native solver
# --------------------------------------------------------------------------

def _auction_single(cost, n_valid, eps_frac=0.002, max_iters=3000,
                    return_iters=False):
    """Forward-auction assignment (Bertsekas), Jacobi variant.

    The Jonker-Volgenant solver above is exact but its Dijkstra inner
    while-loop advances one scanned column per serial iteration — on TPU
    that is ~200k latency-bound steps for a (320, 1024) problem with
    structured costs (5.3 s per train step measured on v5e). The auction
    algorithm instead lets ALL unassigned rows bid simultaneously: every
    iteration is one fully vectorized (n, m) pass, and convergence takes
    2-3 iterations on well-separated costs, ~100 for 5x-duplicated GT
    rows, ~1500 in pathological all-tied cases. The result satisfies
    eps-complementary slackness: total cost within n*eps of the optimum
    (eps = eps_frac * cost spread; measured gaps <= 0.06% on adversarial
    inputs, 0 on typical ones).

    NOTE on eps-scaling: Bertsekas price scaling (large eps -> small,
    warm-started prices) was tried and REVERTED — for the asymmetric
    case (n < m) warm-started prices violate the optimality bound:
    columns overpriced in an early phase and left unassigned block rows
    from genuinely optimal columns (measured 45% cost gap on random
    8x20 instances). Correct asymmetric scaling needs the
    Bertsekas-Castanon lambda mechanism; until then this stays
    single-phase, and `return_iters` exposes the iteration count for
    diagnosis.

    cost: (n, m) float32, rows assigned to distinct columns, minimize.
    Returns col4row (n,) int32, -1 for rows >= n_valid (and, after
    max_iters, for any row still unassigned — callers mask by it).
    """
    n, m = cost.shape
    values = -cost  # maximize
    row_ids = jnp.arange(n, dtype=jnp.int32)
    col_ids = jnp.arange(m, dtype=jnp.int32)
    row_valid = row_ids < n_valid
    # eps from the spread of GENUINE costs only: criterion.build_cost pads
    # invalid GT rows and dummy columns with 1e6 sentinels, which would
    # otherwise inflate the spread ~1e6x and make the n*eps optimality
    # bound vacuous on real training matrices.
    genuine = row_valid[:, None] & (cost < 1e5)
    vmax = jnp.max(jnp.where(genuine, values, -jnp.inf))
    vmin = jnp.min(jnp.where(genuine, values, jnp.inf))
    spread = vmax - vmin
    spread = jnp.where(jnp.isfinite(spread), spread, 1.0)
    spread = jnp.maximum(spread, 1e-3)
    eps = eps_frac * spread

    def cond(state):
        col4row, prices, it = state
        return (row_valid & (col4row < 0)).any() & (it < max_iters)

    def body(state):
        col4row, prices, it = state
        unassigned = row_valid & (col4row < 0)
        net = values - prices[None, :]
        j1 = jnp.argmax(net, axis=1).astype(jnp.int32)
        v1 = jnp.take_along_axis(net, j1[:, None], axis=1)[:, 0]
        net2 = net.at[row_ids, j1].set(-jnp.inf)
        v2 = net2.max(axis=1)
        v2 = jnp.where(jnp.isfinite(v2), v2, v1 - eps)
        bid = prices[j1] + (v1 - v2) + eps
        bid = jnp.where(unassigned, bid, -jnp.inf)
        col_best = jnp.full((m,), -jnp.inf).at[j1].max(bid, mode="drop")
        maybe_won = unassigned & (bid >= col_best[j1])
        # deterministic tie-break: lowest row id among equal best bids
        winner = jnp.full((m,), n, jnp.int32).at[j1].min(
            jnp.where(maybe_won, row_ids, n), mode="drop"
        )
        won = maybe_won & (winner[j1] == row_ids)
        has_winner = winner < n
        # evict rows holding a column that was just won by another row
        held = jnp.clip(col4row, 0, m - 1)
        evicted = (
            (col4row >= 0)
            & has_winner[held]
            & (winner[held] != row_ids)
        )
        col4row = jnp.where(evicted, -1, col4row)
        col4row = jnp.where(won, j1, col4row)
        prices = jnp.where(has_winner, col_best, prices)
        return col4row, prices, it + 1

    col4row, prices, iters = jax.lax.while_loop(
        cond, body, (jnp.full((n,), -1, jnp.int32), jnp.zeros((m,)),
                     jnp.int32(0))
    )
    out = jnp.where(row_valid, col4row, -1)
    if return_iters:
        return out, iters
    return out


def auction(cost, n_valid, **kw):
    """Batched eps-optimal LAP; same interface as `hungarian` but rows may
    exceed columns (leftover rows stay -1)."""
    return jax.vmap(lambda c, n: _auction_single(c, n, **kw))(
        cost.astype(jnp.float32), n_valid
    )


def _auction_capacity_single(cost, n_valid, repeat, eps_frac=0.002,
                             max_iters=3000):
    """Similar-objects (capacity) auction for the repeat-tiled matcher
    matrix (Bertsekas' auction for assignment with similar persons).

    The training cost matrix tiles each GT row `repeat` times
    (criterion.repeat_ground_truth: compacted row r is a copy of GT
    class r % g, g = n_valid // repeat). Running the plain auction on
    the expanded matrix makes the `repeat` identical copies fight
    bidding wars over the same columns — on realistic-density scenes
    that capped max_iters (train step 794 -> 1829 ms). Here each GT
    CLASS holds up to `repeat` columns and bids on its top
    `need` columns per round with the (need+1)-th best as the cutoff —
    no intra-class wars, and each round is a (g, m) pass instead of
    (g*repeat, m).

    eps-CS optimality bound: sum(capacities) * eps, the same class of
    guarantee as the expanded problem. Duplicate rows of one class are
    interchangeable downstream (identical target fields), so returning
    the class's columns in ascending-column order is equivalent to any
    expanded-row assignment.

    cost: (n, m) with n = g_max * repeat slots; returns col4row (n,).
    """
    n, m = cost.shape
    g_max = n // repeat
    g = n_valid // repeat
    class_ids = jnp.arange(g_max, dtype=jnp.int32)
    class_valid = class_ids < g
    values = -cost[:g_max]  # class i's value row == compacted row i
    cap = jnp.where(class_valid, repeat, 0)
    genuine = class_valid[:, None] & (cost[:g_max] < 1e5)
    vmax = jnp.max(jnp.where(genuine, values, -jnp.inf))
    vmin = jnp.min(jnp.where(genuine, values, jnp.inf))
    spread = vmax - vmin
    spread = jnp.where(jnp.isfinite(spread), spread, 1.0)
    spread = jnp.maximum(spread, 1e-3)
    eps = eps_frac * spread
    neg = jnp.float32(-1e30)  # -inf breeds nans in topv - vcut

    def counts_of(col4class):
        return (col4class[None, :] == class_ids[:, None]).sum(axis=1)

    def cond(state):
        col4class, prices, it = state
        return (counts_of(col4class) < cap).any() & (it < max_iters)

    def body(state):
        col4class, prices, it = state
        need = cap - counts_of(col4class)  # (g_max,)
        own = col4class[None, :] == class_ids[:, None]
        net = values - prices[None, :]
        net = jnp.where(own | ~class_valid[:, None], neg, net)
        topv, topj = jax.lax.top_k(net, repeat + 1)  # (g_max, repeat+1)
        vcut = jnp.take_along_axis(
            topv, jnp.clip(need, 0, repeat)[:, None], axis=1
        )  # (g_max, 1): the (need+1)-th best net value
        slot = jnp.arange(repeat + 1, dtype=jnp.int32)[None, :]
        bidding = (slot < need[:, None]) & (topv > neg / 2) & (vcut > neg / 2)
        bid = prices[topj] + (topv - vcut) + eps
        bid = jnp.where(bidding, bid, -jnp.inf)
        flat_j = topj.reshape(-1)
        flat_b = bid.reshape(-1)
        flat_c = jnp.broadcast_to(class_ids[:, None], topj.shape).reshape(-1)
        col_best = jnp.full((m,), -jnp.inf).at[flat_j].max(
            flat_b, mode="drop")
        cand = jnp.where(
            jnp.isfinite(flat_b) & (flat_b >= col_best[flat_j]),
            flat_c, g_max)
        winner = jnp.full((m,), g_max, jnp.int32).at[flat_j].min(
            cand, mode="drop")
        has_w = (winner < g_max) & jnp.isfinite(col_best)
        col4class = jnp.where(has_w, winner, col4class)
        prices = jnp.where(has_w, col_best, prices)
        return col4class, prices, it + 1

    col4class, prices, _ = jax.lax.while_loop(
        cond, body,
        (jnp.full((m,), -1, jnp.int32), jnp.zeros((m,)), jnp.int32(0)))

    # expand class columns to tiled duplicate rows: copy d of class i is
    # compacted row i + d * g; the class's columns go to its copies in
    # ascending-column order
    onehot = col4class[None, :] == class_ids[:, None]  # (g_max, m)
    rank_mat = jnp.cumsum(onehot.astype(jnp.int32), axis=1) - 1
    rk = jnp.take_along_axis(
        rank_mat, jnp.clip(col4class, 0, g_max - 1)[None, :], axis=0
    )[0]  # (m,) rank of each column within its class
    member = col4class >= 0
    row = jnp.where(member, col4class + g * rk, n)
    col4row = jnp.full((n,), -1, jnp.int32).at[row].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    row_valid = jnp.arange(n, dtype=jnp.int32) < n_valid
    return jnp.where(row_valid, col4row, -1)


def auction_capacity(cost, n_valid, repeat, **kw):
    """Batched capacity auction (see _auction_capacity_single)."""
    return jax.vmap(
        lambda c, n: _auction_capacity_single(c, n, repeat, **kw)
    )(cost.astype(jnp.float32), n_valid)
