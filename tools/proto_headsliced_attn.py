#!/usr/bin/env python
"""Retry of the in-kernel head-sliced fused attention (round-4 verdict
item 7).

PERF.md §2 parks ~22 ms/step of train time on "sync layout copies": every
fused-attention site feeds the kernel (B*H, L, D) operands, which XLA builds
from the QKV projections' natural (B, L, H*D) output via a (B,L,H,D) ->
(B,H,L,D) transpose (~0.2 ms x ~20 sites), plus the inverse transpose on the
way out.  A (B,L,H,D)-native BlockSpec is rejected by Mosaic (the
second-to-last block dim must divide by 8 or equal the array's: head block 1
of H=12 does neither).  The round-3 alternative — keep the (B, L, H*D)
layout and slice the 64-column head panes INSIDE the kernel with static
indices, grid over batch only — crashed the relay's AOT compile helper with
HTTP 500 and was never rebuilt.

This prototype rebuilds exactly that variant and answers, on-chip:
  1. does it compile now?  (the retry half of retry-or-retire)
  2. numerics vs the jnp reference from the SAME (B, L, H*D) operands
  3. end-to-end site cost: [transpose + current fused kernel + transpose
     back] vs [head-sliced kernel alone], forward and forward+backward
     (the backward of the head-sliced form falls to autodiff-of-transposes
     in this proto — a real adoption would need a bwd kernel; the fwd A/B
     bounds the win first)

One JSON line per shape.  Run ON the TPU: python tools/proto_headsliced_attn.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_headsliced(h: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(q_ref, k_ref, v_ref, km_ref, pm_ref, o_ref):
        qf = q_ref[0]                        # (lq, h*d)
        kf = k_ref[0]                        # (lk, h*d)
        vf = v_ref[0]
        d = qf.shape[-1] // h
        scale = 1.0 / (d ** 0.5)
        for hh in range(h):
            sl = slice(hh * d, (hh + 1) * d)
            s = jax.lax.dot_general(
                qf[:, sl], kf[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + km_ref[0, 0][None, :] + pm_ref[...]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(vf.dtype), vf[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, sl] = o.astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=())
    def call(q2, k2, v2, km, pm):
        b, lq, hd = q2.shape
        lk = k2.shape[1]
        bs = lambda l: pl.BlockSpec((1, l, hd), lambda i: (i, 0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _kernel,
            grid=(b,),
            in_specs=[
                bs(lq), bs(lk), bs(lk),
                pl.BlockSpec((1, 1, lk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((lq, lk), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=bs(lq),
            out_shape=jax.ShapeDtypeStruct((b, lq, hd), q2.dtype),
            interpret=interpret,
        )(q2, k2, v2, km, pm)

    return call


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.kernels.attention import fused_attention

    b = int(os.environ.get("HS_BATCH", "64"))
    h, d = 12, 64
    dtype = jnp.bfloat16
    iters = int(os.environ.get("HS_ITERS", "30"))
    shapes = [(40, 40), (393, 393), (128, 393)]

    hs = make_headsliced(h)

    def via_transpose(q2, k2, v2, mask):
        bb, lq, hd = q2.shape
        lk = k2.shape[1]
        q4 = q2.reshape(bb, lq, h, d).transpose(0, 2, 1, 3)
        k4 = k2.reshape(bb, lk, h, d).transpose(0, 2, 1, 3)
        v4 = v2.reshape(bb, lk, h, d).transpose(0, 2, 1, 3)
        o = fused_attention(q4, k4, v4, mask)
        return o.transpose(0, 2, 1, 3).reshape(bb, lq, hd)

    via_transpose_j = jax.jit(via_transpose)

    for lq, lk in shapes:
        rng = np.random.RandomState(0)
        q2 = jnp.asarray(rng.randn(b, lq, h * d), dtype)
        k2 = jnp.asarray(rng.randn(b, lk, h * d), dtype)
        v2 = jnp.asarray(rng.randn(b, lk, h * d), dtype)
        kmf = np.where(rng.rand(b, 1, lk) < 0.1, -10000.0, 0.0)
        km = jnp.asarray(kmf, jnp.float32)
        mask4 = jnp.asarray(kmf[:, None], jnp.float32)   # (b,1,1,lk)
        pm = jnp.zeros((lq, lk), jnp.float32)
        q2, k2, v2, km, mask4, pm = jax.device_put(
            (q2, k2, v2, km, mask4, pm))

        try:
            out_hs = hs(q2, k2, v2, km, pm)
            out_hs.block_until_ready()
        except Exception as e:  # the retry verdict: does it even compile?
            print(json.dumps({
                "shape": f"b{b} {lq}x{lk}",
                "compile": "FAILED",
                "error": repr(e)[:500],
            }), flush=True)
            continue
        out_tr = via_transpose_j(q2, k2, v2, mask4)
        err = float(jnp.max(jnp.abs(
            out_hs.astype(jnp.float32) - out_tr.astype(jnp.float32))))

        def timeit(fn, *args):
            _ = float(fn(*args)[0, 0, 0])
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(iters)]
            _ = float(outs[-1][0, 0, 0])
            return (time.perf_counter() - t0) / iters * 1000

        hs_ms = timeit(hs, q2, k2, v2, km, pm)
        tr_ms = timeit(via_transpose_j, q2, k2, v2, mask4)

        # fwd+bwd: proto backward is autodiff (transposes re-appear in the
        # head-sliced VJP as the transpose of the slice-writes; a real
        # adoption would hand-write the bwd kernel) — still bounds the
        # achievable win on the fwd side
        print(json.dumps({
            "shape": f"b{b} h{h} {lq}x{lk} d{d}",
            "compile": "ok",
            "max_err_vs_transpose_path": round(err, 5),
            "headsliced_ms": round(hs_ms, 3),
            "transpose_path_ms": round(tr_ms, 3),
            "speedup": round(tr_ms / hs_ms, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
