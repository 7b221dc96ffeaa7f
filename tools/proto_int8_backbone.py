#!/usr/bin/env python
"""Prototype: int8-quantized frozen-backbone bottleneck (inference only).

Motivation (PERF.md par. 2/6): the frozen 3D-ResNet backbone is the largest
inference segment (~90 ms of 192 at b64) and sits at the measured HBM
bandwidth floor in bf16.  v5e executes s8 x s8 -> s32 on the MXU at 2x the
bf16 peak AND int8 activations halve the streamed bytes, so IF XLA lowers
integer convs to the MXU, a quantized frozen backbone attacks the floor
itself rather than the op schedule (every bf16 reformulation measured
slower - PERF.md par. 5).

Scheme (weights frozen => static quant, no calibration pass needed in-graph):
  - weights:  symmetric per-output-channel int8, scales folded into the
    existing FrozenBatchNorm scale vector (zero extra epilogue work)
  - activations: symmetric per-tensor int8 with a STATIC scale (the frozen
    backbone's post-ReLU ranges are fixed functions of the input
    normalization; scales come from one offline calibration batch, exactly
    like the BN folding itself).  Quantize = mul+round+clip+cast, fused by
    XLA into the producing epilogue.

This prototype measures, at res_2 bottleneck dims (n=256, 56x56, 256/64/256):
  1. raw 3x3 conv: bf16 vs int8 (is the MXU int8 path real?)
  2. full bottleneck chain: bf16 reference vs int8-everywhere
  3. numerics of the int8 chain vs the f32 chain
Run ON the TPU: python tools/proto_int8_backbone.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _quant_sym(x, scale):
    """Symmetric int8 quantization with a static scale."""
    import jax.numpy as jnp
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def main() -> None:
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("PROTO_N", "256"))
    h = w = 56
    ci, cm, co = 256, 64, 256
    rng = np.random.RandomState(0)
    f32 = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.float32)  # noqa: E731

    x = f32(n, h, w, ci)
    wa, wb, wc = f32(ci, cm), f32(3, 3, cm, cm), f32(cm, co)
    sa, ba = f32(cm) * 0.05 + 1.0, f32(cm)
    sb, bb = f32(cm) * 0.05 + 1.0, f32(cm)
    sc, bc = f32(co) * 0.05 + 1.0, f32(co)

    def conv2d(t, k, **kw):
        return jax.lax.conv_general_dilated(
            t, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)

    # ---- f32 oracle + bf16 production path -------------------------------
    def chain_f32(x):
        a = jnp.maximum((x @ wa) * sa + ba, 0)
        b = jnp.maximum(conv2d(a, wb) * sb + bb, 0)
        c = (b @ wc) * sc + bc
        return jnp.maximum(c + x, 0)

    cast = lambda t: t.astype(jnp.bfloat16)  # noqa: E731

    def chain_bf16(xb):
        a = jnp.maximum((xb @ cast(wa)) * cast(sa) + cast(ba), 0)
        b = jnp.maximum(conv2d(a, cast(wb)) * cast(sb) + cast(bb), 0)
        c = (b @ cast(wc)) * cast(sc) + cast(bc)
        return jnp.maximum(c + xb, 0)

    # ---- int8 path --------------------------------------------------------
    # per-output-channel weight scales; per-tensor activation scales taken
    # from the f32 oracle's intermediate maxima (the offline calibration)
    swa = jnp.max(jnp.abs(wa), axis=0) / 127.0           # (cm,)
    swb = jnp.max(jnp.abs(wb), axis=(0, 1, 2)) / 127.0   # (cm,)
    swc = jnp.max(jnp.abs(wc), axis=0) / 127.0           # (co,)
    wa_q = _quant_sym(wa, swa)
    wb_q = _quant_sym(wb, swb)
    wc_q = _quant_sym(wc, swc)

    a_f = jnp.maximum((x @ wa) * sa + ba, 0)
    b_f = jnp.maximum(conv2d(a_f, wb) * sb + bb, 0)
    sx = float(jnp.max(jnp.abs(x))) / 127.0
    sa_act = float(jnp.max(a_f)) / 127.0
    sb_act = float(jnp.max(b_f)) / 127.0

    x_q = _quant_sym(x, sx)

    def chain_i8(x_q):
        # residual is the dequantized int8 input: the chain streams ONLY
        # int8 activations (the deployment scheme quantizes stage inputs)
        xb = x_q.astype(jnp.bfloat16) * jnp.bfloat16(sx)
        # conv_a as int8 matmul; dequant+BN+ReLU+requant in one epilogue
        a32 = jax.lax.dot_general(
            x_q, wa_q, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        a = jnp.maximum(a32.astype(jnp.bfloat16)
                        * cast(sx * swa * sa)[None] + cast(ba), 0)
        a_q = _quant_sym(a, sa_act)
        b32 = conv2d(a_q, wb_q, preferred_element_type=jnp.int32)
        b = jnp.maximum(b32.astype(jnp.bfloat16)
                        * cast(sa_act * swb * sb)[None] + cast(bb), 0)
        b_q = _quant_sym(b, sb_act)
        c32 = jax.lax.dot_general(
            b_q, wc_q, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        c = (c32.astype(jnp.bfloat16)
             * cast(sb_act * swc * sc)[None] + cast(bc))
        return jnp.maximum(c + xb, 0)

    # ---- numerics ---------------------------------------------------------
    want = np.asarray(jax.jit(chain_f32)(x), np.float32)
    got_bf = np.asarray(jax.jit(chain_bf16)(cast(x)), np.float32)
    got_i8 = np.asarray(jax.jit(chain_i8)(x_q), np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    print(f"bf16 vs f32: rel {np.abs(got_bf - want).max() / scale:.2e}")
    print(f"int8 vs f32: rel {np.abs(got_i8 - want).max() / scale:.2e}  "
          f"mean {np.abs(got_i8 - want).mean() / scale:.2e}")

    # ---- raw 3x3 conv micro ----------------------------------------------
    a_bf = cast(a_f)
    a_qd = _quant_sym(a_f, sa_act)
    conv_bf = jax.jit(lambda t: jnp.sum(conv2d(t, cast(wb))
                                        .astype(jnp.float32)))
    conv_i8 = jax.jit(lambda t: jnp.sum(
        conv2d(t, wb_q, preferred_element_type=jnp.int32)))

    def bench(name, fn, arg, iters=20):
        fn(arg).block_until_ready()
        t0 = time.perf_counter()
        outs = [fn(arg) for _ in range(iters)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:24s} {dt * 1e3:8.3f} ms")
        return dt

    print(f"\nraw 3x3 conv ({n},{h},{w},{cm}):")
    t_bf = bench("bf16 conv", conv_bf, a_bf)
    t_i8 = bench("int8 conv->s32", conv_i8, a_qd)
    print(f"int8/bf16 conv ratio: {t_i8 / t_bf:.2f}x")

    # ---- full chain -------------------------------------------------------
    xb = cast(x)
    chain_bf_j = jax.jit(lambda t: jnp.sum(chain_bf16(t)
                                           .astype(jnp.float32)))
    chain_i8_j = jax.jit(
        lambda q: jnp.sum(chain_i8(q).astype(jnp.float32)))
    print(f"\nfull bottleneck chain ({n},{h},{w},{ci}/{cm}/{co}):")
    chain_i8_j(x_q).block_until_ready()
    chain_bf_j(xb).block_until_ready()
    t0 = time.perf_counter()
    outs = [chain_bf_j(xb) for _ in range(20)]
    float(outs[-1])
    t_bf_chain = (time.perf_counter() - t0) / 20
    print(f"{'bf16 chain':24s} {t_bf_chain * 1e3:8.3f} ms")
    t0 = time.perf_counter()
    outs = [chain_i8_j(x_q) for _ in range(20)]
    float(outs[-1])
    t_i8_chain = (time.perf_counter() - t0) / 20
    print(f"{'int8 chain':24s} {t_i8_chain * 1e3:8.3f} ms")
    print(f"int8/bf16 chain ratio: {t_i8_chain / t_bf_chain:.2f}x")


if __name__ == "__main__":
    main()
