"""On-device batched Hungarian assignment.

The reference solves its set-prediction matching with per-sample
``scipy.optimize.linear_sum_assignment`` calls on the CPU
(``lxrt/matcher.py:76-80,100-103``) — a device->host sync in the middle of
every training step.  Here the linear assignment problem is solved ON DEVICE
with a fixed-shape shortest-augmenting-path (Jonker-Volgenant style) solver
written in ``jax.lax`` control flow and batched with ``vmap``: the per-frame
mode is B*16 tiny problems (<= num_rel x num_rel), the global mode one
128x128 problem per sample.

Exactness: rectangular problems (fewer targets than queries) are padded to
square with a CONSTANT cost column.  A constant pad column adds the same
amount to every complete assignment, so the restriction to real columns of
the optimal square solution is exactly the optimal rectangular solution —
bit-identical total cost to scipy (verified in tests/test_matcher.py).

Cost semantics match the reference: cost = -softmax(logits)[target_class]
(``matcher.py:72-76``), matching under no_grad (stop_gradient here).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalar, NOT jnp: a module-level jnp constant initializes the XLA
# backend at import, which breaks jax.distributed.initialize() in
# multi-host drivers (it must run before any backend use)
_INF = np.float32(1e9)


def hungarian_square(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve an n x n linear assignment problem; minimize total cost.

    Returns row_to_col: (n,) int32, a permutation.

    Shortest-augmenting-path algorithm with potentials, O(n^3)
    (1-indexed internally with column 0 as the path sentinel).

    TPU-first: ALL loops have FIXED trip counts with masked no-op tails
    instead of data-dependent while_loops.  Each row's Dijkstra front visits
    at most n+1 columns, so n+1 masked iterations are always enough; same
    for the augmenting-path walk.  Fixed trips keep vmapped lanes in
    lock-step (no convergence coupling), compile faster, and map cleanly
    onto the scalar pipeline.
    """
    n = cost.shape[0]
    cx = jnp.zeros((n + 1, n + 1), jnp.float32)
    cx = cx.at[1:, 1:].set(cost.astype(jnp.float32))

    def row_body(i, carry):
        u, v, p, way = carry
        p = p.at[0].set(i)
        minv = jnp.full((n + 1,), _INF, jnp.float32)
        used = jnp.zeros((n + 1,), bool)

        def search_body(_, state):
            j0, minv, used, u, v, p, way, done = state
            # no-op once the augmenting path endpoint was found
            active = jnp.logical_not(done)
            used = jnp.where(active, used.at[j0].set(True), used)
            i0 = p[j0]
            cur = cx[i0] - u[i0] - v
            better = (cur < minv) & (~used) & active
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, _INF, minv).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = jnp.where(active, masked[j1], 0.0)
            used_f = jnp.where(active, used.astype(jnp.float32), 0.0)
            u = u + delta * jnp.zeros((n + 1,)).at[p].add(used_f)
            v = v - delta * used_f
            minv = minv - delta * (1.0 - used.astype(jnp.float32))
            j0 = jnp.where(active, j1, j0)
            done = done | (p[j0] == 0)
            return (j0, minv, used, u, v, p, way, done)

        j0 = jnp.int32(0)
        done = jnp.asarray(False)
        # the path reaches a free column within n+1 expansions
        j0, minv, used, u, v, p, way, done = jax.lax.fori_loop(
            0, n + 1, search_body, (j0, minv, used, u, v, p, way, done)
        )

        # augmenting path: walk `way` back to the sentinel (at most n steps)
        def path_body(_, state):
            j0, p = state
            active = j0 != 0
            j1 = way[j0]
            p = jnp.where(active, p.at[j0].set(p[j1]), p)
            j0 = jnp.where(active, j1, j0)
            return (j0, p)

        _, p = jax.lax.fori_loop(0, n + 1, path_body, (j0, p))
        return (u, v, p, way)

    u = jnp.zeros((n + 1,), jnp.float32)
    v = jnp.zeros((n + 1,), jnp.float32)
    p = jnp.zeros((n + 1,), jnp.int32)       # p[j] = row matched to column j
    way = jnp.zeros((n + 1,), jnp.int32)
    u, v, p, way = jax.lax.fori_loop(1, n + 1, row_body, (u, v, p, way))

    col_to_row = p[1:] - 1                    # 0-based
    row_to_col = (
        jnp.zeros((n,), jnp.int32)
        .at[col_to_row]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    return row_to_col


def hungarian_bitmask_dp(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact n x n LSA via Held-Karp subset DP — the TPU fast path for the
    per-frame problems (n = num_rel <= 8 or num_act <= 3).

    dp_i[mask] = min cost of assigning rows 0..i-1 to the column subset
    ``mask``; transition gathers dp_{i-1}[mask ^ bit_j] through a STATIC
    (2^n, n) xor table, so each of the n forward steps (and n backtrack
    steps) is one dense gather+min over (2^n, n) — no scatters, no
    data-dependent control flow, vmap lanes fully independent.
    O(n * 2^n) work: 2048 cells at n=8.

    Returns row_to_col (n,) int32 (a permutation).
    """
    n = cost.shape[0]
    m = 1 << n
    cost = cost.astype(jnp.float32)

    # static tables
    masks = np.arange(m)
    bits = ((masks[:, None] >> np.arange(n)[None, :]) & 1).astype(bool)
    xor_table = jnp.asarray(masks[:, None] ^ (1 << np.arange(n))[None, :])
    in_mask = jnp.asarray(bits)                      # (m, n)

    dp = jnp.full((m,), _INF, jnp.float32).at[0].set(0.0)
    choices = []
    for i in range(n):
        prev = dp[xor_table]                          # (m, n)
        cand = jnp.where(in_mask, prev + cost[i][None, :], _INF)
        choice = jnp.argmin(cand, axis=-1)            # (m,)
        choices.append(choice)
        dp = jnp.min(cand, axis=-1)

    # backtrack from the full mask
    row_to_col = jnp.zeros((n,), jnp.int32)
    mask = jnp.int32(m - 1)
    for i in range(n - 1, -1, -1):
        j = choices[i][mask].astype(jnp.int32)
        row_to_col = row_to_col.at[i].set(j)
        mask = mask ^ (jnp.int32(1) << j)
    return row_to_col


# bitmask DP memory/compute grows as n*2^n; beyond this, use the
# augmenting-path solver
_DP_MAX_N = 12


def assign_padded(cost: jnp.ndarray, num_valid_cols: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LSA on an (n_rows, n_cols) cost where only the first num_valid_cols
    columns are real.  Pads invalid columns to constant 0 (greater than any
    real cost of the -softmax form, and constant => exact).

    Returns (row_to_col (n_rows,), row_matched (n_rows,) bool)."""
    n_rows, n_cols = cost.shape
    n = max(n_rows, n_cols)
    col_ids = jnp.arange(n_cols)
    cost = jnp.where(col_ids[None, :] < num_valid_cols, cost, 0.0)
    if n != n_rows or n != n_cols:
        sq = jnp.zeros((n, n), cost.dtype)
        sq = sq.at[:n_rows, :n_cols].set(cost)
        cost = sq
    solver = hungarian_bitmask_dp if n <= _DP_MAX_N else hungarian_square
    row_to_col = solver(cost)[:n_rows]
    matched = row_to_col < num_valid_cols
    return row_to_col, matched


@partial(jax.jit, static_argnames=("background_idx",))
def match_targets_per_frame(
    logits: jnp.ndarray,    # (B, S, R, C) raw class logits per frame
    labels: jnp.ndarray,    # (B, S, K) padded target labels (0 = pad)
    lengths: jnp.ndarray,   # (B, S) number of valid targets per frame
    background_idx: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame Hungarian matching (--LossHGPerFrame).

    Returns (target_classes (B, S, R) int32 grid with background where
    unmatched, matched (B, S, R) bool).  Equivalent to the reference's
    per-frame split (``matcher.py:66-81``) + scatter
    (``agqaHGQA.py:216-224``), with no host round-trip.
    """
    logits = jax.lax.stop_gradient(logits)
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    # cost[b,s,i,j] = -prob[b,s,i, labels[b,s,j]]
    cost = -jnp.take_along_axis(
        prob,
        labels[:, :, None, :].astype(jnp.int32),
        axis=-1,
    )  # (B, S, R, K)

    def solve_one(c, k):
        return assign_padded(c, k)

    solve = jax.vmap(jax.vmap(solve_one))
    row_to_col, matched = solve(cost, lengths)

    gathered = jnp.take_along_axis(
        labels, jnp.minimum(row_to_col, labels.shape[-1] - 1), axis=-1
    )
    target_classes = jnp.where(matched, gathered, background_idx)
    return target_classes.astype(jnp.int32), matched


@partial(jax.jit, static_argnames=("background_idx",))
def match_targets_global(
    logits: jnp.ndarray,    # (B, Q, C)
    labels: jnp.ndarray,    # (B, N) padded target labels
    lengths: jnp.ndarray,   # (B,)
    background_idx: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-clip Hungarian matching (loss_hg_per_frame=False)."""
    logits = jax.lax.stop_gradient(logits)
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    cost = -jnp.take_along_axis(
        prob, labels[:, None, :].astype(jnp.int32), axis=-1
    )  # (B, Q, N)
    row_to_col, matched = jax.vmap(assign_padded)(cost, lengths)
    gathered = jnp.take_along_axis(
        labels, jnp.minimum(row_to_col, labels.shape[-1] - 1), axis=-1
    )
    target_classes = jnp.where(matched, gathered, background_idx)
    return target_classes.astype(jnp.int32), matched
