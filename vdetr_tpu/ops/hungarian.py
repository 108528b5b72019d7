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
