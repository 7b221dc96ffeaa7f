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

_INF = jnp.float32(1e9)


def hungarian_square(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve an n x n linear assignment problem; minimize total cost.

    Returns row_to_col: (n,) int32, a permutation.

    Shortest-augmenting-path algorithm with potentials, O(n^3), fixed shapes
    (1-indexed internally with column 0 as the path sentinel).
    """
    n = cost.shape[0]
    cx = jnp.zeros((n + 1, n + 1), jnp.float32)
    cx = cx.at[1:, 1:].set(cost.astype(jnp.float32))

    def row_body(i, carry):
        u, v, p, way = carry
        p = p.at[0].set(i)
        minv = jnp.full((n + 1,), _INF, jnp.float32)
        used = jnp.zeros((n + 1,), bool)
        j0 = jnp.int32(0)

        def cond(state):
            j0, _, _, _, _, p, _ = state
            return p[j0] != 0

        def body(state):
            j0, minv, used, u, v, p, way = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cx[i0] - u[i0] - v
            better = (cur < minv) & (~used)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, _INF, minv).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # used columns: u[p[j]] += delta, v[j] -= delta;
            # unused: minv[j] -= delta
            used_f = used.astype(jnp.float32)
            u = u + delta * jnp.zeros((n + 1,)).at[p].add(used_f)
            v = v - delta * used_f
            minv = minv - delta * (1.0 - used_f)
            return (j1, minv, used, u, v, p, way)

        j0, minv, used, u, v, p, way = jax.lax.while_loop(
            cond, body, (j0, minv, used, u, v, p, way)
        )

        # augmenting path: walk `way` back to the sentinel, shifting matches
        def path_cond(state):
            j0, _ = state
            return j0 != 0

        def path_body(state):
            j0, p = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (j1, p)

        _, p = jax.lax.while_loop(path_cond, path_body, (j0, p))
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
    row_to_col = hungarian_square(cost)[:n_rows]
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
