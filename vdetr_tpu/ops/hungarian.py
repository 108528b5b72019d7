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

def _auction_single(cost, n_valid, eps_frac=0.002, max_iters=3000):
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

    col4row, prices, _ = jax.lax.while_loop(
        cond, body, (jnp.full((n,), -1, jnp.int32), jnp.zeros((m,)),
                     jnp.int32(0))
    )
    return jnp.where(row_valid, col4row, -1)


def auction(cost, n_valid, **kw):
    """Batched eps-optimal LAP; same interface as `hungarian` but rows may
    exceed columns (leftover rows stay -1)."""
    return jax.vmap(lambda c, n: _auction_single(c, n, **kw))(
        cost.astype(jnp.float32), n_valid
    )
