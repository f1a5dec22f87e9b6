"""Exact linear-sum-assignment (Hungarian) solver in pure jnp.

The reference solves DETR's bipartite matching with scipy's
`linear_sum_assignment` on host (detrex HungarianMatcher, used at
simvg/models/heads/tgqs_kd_detr_head/tgqs_kd_detr_head.py:132-137 and
simvg/core/criterion/criterion.py:239), which forces a device->host sync
every training step.  Problem sizes here are tiny (num_queries in
{1, 10}), so an exact O(N^3) shortest-augmenting-path solver runs
entirely on device, keeps the train step pure, and vmaps over the batch.

Algorithm: Jonker-Volgenant style successive shortest augmenting paths
with dual variables — the same algorithm scipy implements
(scipy/optimize/rectangular_lsap).  We solve the *rectangular* problem
directly with targets as rows (rows <= cols), so variable per-sample
target counts are handled by skipping invalid rows with `lax.cond` —
no big-constant column padding (which would poison fp32 dual variables).
All loops are `lax` control flow with static bounds, so the function
jits and vmaps cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _solve_rect(cost: jnp.ndarray, row_valid: jnp.ndarray):
    """Match every VALID row of cost [R, C] (R <= C) to a distinct column.

    Returns col4row int32 [R]: the assigned column per valid row, -1 for
    invalid rows.  Minimises total cost over valid rows; equivalent to
    scipy.linear_sum_assignment on the valid-row submatrix.
    """
    r_dim, c_dim = cost.shape
    assert r_dim <= c_dim, (
        f"need rows <= cols, got {cost.shape}; transpose the problem"
    )
    cost = jnp.nan_to_num(cost.astype(jnp.float32), posinf=3e38,
                          neginf=-3e38)

    def augment_row(cur_row, carry):
        u, v, col4row, row4col = carry

        # Dijkstra over columns for the shortest augmenting path from
        # cur_row (mirrors scipy rectangular_lsap.cpp).
        shortest0 = jnp.full((c_dim,), _INF, jnp.float32)
        path0 = jnp.full((c_dim,), -1, jnp.int32)
        sr0 = jnp.zeros((r_dim,), bool).at[cur_row].set(True)
        sc0 = jnp.zeros((c_dim,), bool)
        state0 = (cur_row, jnp.float32(0.0), shortest0, path0, sr0, sc0,
                  jnp.int32(-1))

        def cond(state):
            return state[6] < 0

        def body(state):
            i, min_val, shortest, path, sr, sc, _ = state
            reduced = min_val + cost[i, :] - u[i] - v
            better = (reduced < shortest) & ~sc
            shortest = jnp.where(better, reduced, shortest)
            path = jnp.where(better, i, path)

            masked = jnp.where(sc, _INF, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            sc = sc.at[j].set(True)

            nxt = row4col[j]
            sink = jnp.where(nxt < 0, j, jnp.int32(-1))
            i = jnp.where(nxt < 0, i, nxt)
            sr = sr.at[jnp.clip(i, 0)].set(True)
            return (i, min_val, shortest, path, sr, sc, sink)

        _, min_val, shortest, sr_path, sr, sc, sink = jax.lax.while_loop(
            cond, body, state0
        )
        path = sr_path

        # Dual updates.
        u = u.at[cur_row].add(min_val)
        others = sr & (jnp.arange(r_dim) != cur_row)
        shortest_at_col4row = shortest[jnp.clip(col4row, 0)]
        u = jnp.where(others, u + min_val - shortest_at_col4row, u)
        v = jnp.where(sc, v - (min_val - shortest), v)

        # Augment along the alternating path ending at `sink`.
        def aug_cond(s):
            return s[3]

        def aug_body(s):
            j, row4col, col4row, _ = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            jnxt = col4row[i]
            col4row = col4row.at[i].set(j)
            return (jnxt, row4col, col4row, i != cur_row)

        _, row4col, col4row, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, row4col, col4row, jnp.bool_(True))
        )
        return (u, v, col4row, row4col)

    def step(cur_row, carry):
        return jax.lax.cond(
            row_valid[cur_row],
            lambda c: augment_row(cur_row, c),
            lambda c: c,
            carry,
        )

    u0 = jnp.zeros((r_dim,), jnp.float32)
    v0 = jnp.zeros((c_dim,), jnp.float32)
    col4row0 = jnp.full((r_dim,), -1, jnp.int32)
    row4col0 = jnp.full((c_dim,), -1, jnp.int32)
    _, _, col4row, _ = jax.lax.fori_loop(
        0, r_dim, step, (u0, v0, col4row0, row4col0)
    )
    return col4row


@functools.partial(jax.jit, static_argnames=())
def hungarian_assign(cost: jnp.ndarray, col_valid: jnp.ndarray | None = None):
    """Match rows (predictions) to columns (targets), minimising total cost.

    Args:
        cost: [N, M] cost matrix with N >= M (more predictions than
            targets — DETR always satisfies this; targets are padded to a
            static maximum <= num_queries).
        col_valid: optional bool [M]; invalid (padded) columns are treated
            as absent.  This is how per-sample variable target counts
            (GRefCOCO multi-target, simvg/datasets/pipelines/
            loading.py:224-239) stay static-shaped under jit.

    Returns:
        col4row: int32 [N]; col4row[i] = j if row i is matched to a VALID
            column j, else -1.
        row4col: int32 [M]; row4col[j] = matched row for valid column j,
            -1 for invalid columns.
    """
    n, m = cost.shape
    assert n >= m, (
        f"hungarian_assign requires rows >= cols, got {cost.shape}"
    )
    if col_valid is None:
        col_valid = jnp.ones((m,), bool)
    else:
        col_valid = col_valid.astype(bool)

    # Solve with targets as rows: [M, N], every valid target gets a row.
    row4col = _solve_rect(cost.T, col_valid)  # [M] -> query index or -1

    col4row = jnp.full((n,), -1, jnp.int32)
    # scatter: query row4col[j] <- j  (only valid j)
    safe_rows = jnp.clip(row4col, 0)
    updates = jnp.where(row4col >= 0, jnp.arange(m, dtype=jnp.int32), -1)
    col4row = col4row.at[safe_rows].max(updates)
    return col4row, row4col
