"""Pallas fused attention for TPU.

All attention in this model runs over short sequences (text 40, visual 393,
hypergraph 177, decoder queries 128), so the kernel keeps one (batch, head)
attention problem entirely in VMEM: QK^T, additive mask, f32 softmax, and PV
fused in a single pass — no HBM round-trips for the score matrix, which is
what XLA materializes when the pattern doesn't fuse cleanly (the softmax
+ dropout + mask chain often breaks its fusion).

Shapes are padded to lane/sublane-friendly multiples (seq -> 128) with the
pad keys masked by -inf; the wrapper slices the result back.  Numerics match
the jnp path to f32 softmax accuracy (tests/test_pallas_attention.py).

Enable globally with ``enable(True)`` (the Trainer does this when
``Config.use_pallas_attention`` is set) — ``models.layers.Attention``
consults the switch at trace time; on non-TPU backends it always falls back
to the jnp path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_ENABLED = False


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def is_enabled() -> bool:
    if not _ENABLED:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return False
    return platform in ("tpu", "axon")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """q: (B, H, Lq, D), k/v: (B, H, Lk, D), mask: additive broadcastable to
    (B, H, Lq, Lk) or None.  Returns (B, H, Lq, D) in q.dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_p = _round_up(lq, 128)
    lk_p = _round_up(lk, 128)
    d_p = _round_up(d, 128)

    qp = jnp.zeros((b, h, lq_p, d_p), q.dtype).at[:, :, :lq, :d].set(q)
    kp = jnp.zeros((b, h, lk_p, d_p), k.dtype).at[:, :, :lk, :d].set(k)
    vp = jnp.zeros((b, h, lk_p, d_p), v.dtype).at[:, :, :lk, :d].set(v)

    # fold the pad-key mask into the additive mask (f32, full shape)
    full_mask = jnp.zeros((b, h, lq_p, lk_p), jnp.float32)
    if mask is not None:
        full_mask = full_mask.at[:, :, :lq, :lk].add(
            jnp.broadcast_to(mask, (b, h, lq, lk)).astype(jnp.float32))
    if lk_p != lk:
        full_mask = full_mask.at[:, :, :, lk:].set(-1e30)

    scale = 1.0 / (d ** 0.5)

    def kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        qb = q_ref[0]          # (lq_p, d_p)
        kb = k_ref[0]
        vb = v_ref[0]
        scores = jax.lax.dot_general(
            qb, kb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = scores + m_ref[0]
        probs = jax.nn.softmax(scores, axis=-1)
        out = jax.lax.dot_general(
            probs.astype(vb.dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = out.astype(o_ref.dtype)

    grid = (b * h,)
    qf = qp.reshape(b * h, lq_p, d_p)
    kf = kp.reshape(b * h, lk_p, d_p)
    vf = vp.reshape(b * h, lk_p, d_p)
    mf = full_mask.reshape(b * h, lq_p, lk_p)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, lq_p, d_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq_p, lk_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq_p, d_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d_p), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (lq_p * lk_p * d_p * 2),
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize
            + mf.size * 4,
            transcendentals=b * h * lq_p * lk_p,
        ),
        interpret=interpret,
    )(qf, kf, vf, mf)

    return out.reshape(b, h, lq_p, d_p)[:, :, :lq, :d]
