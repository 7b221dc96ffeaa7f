#!/usr/bin/env python
"""Prototype: visual tokenizer Conv3d(5,3,3) + bias + GeLU as one Pallas
kernel.

conv1 of the tokenizer is the single largest op in the b64 inference
profile: 27.5 ms at ~49% MFU (XLA reformulations all lose —
tools/bench_micro.py).  Kernel plan:
  grid = (B, n_co, n_kc), kc innermost; f32 scratch accumulator
  x block (1, T, 7, 7, KC) padded spatially in-kernel (concat) to 9x9
  45 taps: xp[dt:dt+T', dy:dy+7, dx:dx+7, :] reshaped (T'*49, KC), each a
  dot against w[dt,dy,dx] (KC, CO_BLK) -- N=128 keeps the MXU full
  last kc step: + bias, exact-erf GeLU (A-S polynomial, the fused-FFN
  precedent), store bf16.

The open question this prototype answers: does Mosaic lower the
slice-then-reshape (strided sublanes) efficiently?  Run ON the TPU.

MEASURED: NEGATIVE RESULT (kept so future rounds don't retry).
- KC=512: compile-time VMEM stack OOM (39.4 MB vs the 16 MB scoped
  limit) — the 45 per-tap relayout copies stay live on the kernel stack.
- KC=256: still OOM (19.4 MB).
- KC=128: compiles, numerics green on-chip (rel 2.4e-3), but
  45.9 ms vs XLA's 32.7 ms at b64 — K=128 dots starve the MXU and the
  tap relayouts burn VMEM bandwidth.  XLA's NDHWC conv runs this op at
  163 TFLOP/s standalone; together with tools/bench_micro.py (all XLA
  reformulations also lose) the tokenizer conv is as fast as this
  platform will go.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


@functools.lru_cache(maxsize=None)
def _make_tok(t: int, s: int, kt: int, interpret: bool, gelu: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from shgvqa_tpu.kernels.ffn import _erf

    to = t - kt + 1   # valid temporal outputs
    m = to * s * s

    def kernel(x_ref, w_ref, b_ref, o_ref, acc_ref):
        kc = pl.program_id(2)
        nkc = pl.num_programs(2)

        @pl.when(kc == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x = x_ref[0]                                  # (T, 7, 7, KC)
        ck = x.shape[-1]
        zcol = jnp.zeros((t, s, 1, ck), x.dtype)
        xp = jnp.concatenate([zcol, x, zcol], axis=2)  # (T, 7, 9, KC)
        zrow = jnp.zeros((t, 1, s + 2, ck), x.dtype)
        xp = jnp.concatenate([zrow, xp, zrow], axis=1)  # (T, 9, 9, KC)

        acc = acc_ref[...]
        for dt in range(kt):
            for dy in range(3):
                for dx in range(3):
                    xs = xp[dt:dt + to, dy:dy + s, dx:dx + s, :]
                    acc += jax.lax.dot_general(
                        xs.reshape(m, ck), w_ref[dt, dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        acc_ref[...] = acc

        @pl.when(kc == nkc - 1)
        def _store():
            y = acc_ref[...] + b_ref[...].astype(jnp.float32)
            if gelu:
                y = y * 0.5 * (1.0 + _erf(y * 0.7071067811865476))
            o_ref[0] = y.reshape(to, s, s, -1).astype(o_ref.dtype)

    def call(x, w, b):
        bsz, tt, ss, _, ci = x.shape
        co = w.shape[-1]
        co_blk = 128
        kc_blk = int(os.environ.get("PROTO_KC", "128"))
        if ci % kc_blk != 0:
            kc_blk = ci
        n_co = co // co_blk
        n_kc = ci // kc_blk
        return pl.pallas_call(
            kernel,
            grid=(bsz, n_co, n_kc),
            in_specs=[
                pl.BlockSpec((1, tt, ss, ss, kc_blk),
                             lambda bi, coi, kci: (bi, 0, 0, 0, kci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kt, 3, 3, kc_blk, co_blk),
                             lambda bi, coi, kci: (0, 0, 0, kci, coi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co_blk),
                             lambda bi, coi, kci: (0, coi),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, to, ss, ss, co_blk),
                lambda bi, coi, kci: (bi, 0, 0, 0, coi),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, to, ss, ss, co), x.dtype),
            scratch_shapes=[pltpu.VMEM((m, co_blk), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * bsz * m * kt * 9 * ci * co,
                bytes_accessed=2 * bsz * (tt * ss * ss * ci * n_co
                                          + to * ss * ss * co),
                transcendentals=bsz * m * co if gelu else 0,
            ),
            interpret=interpret,
        )(x, w, b.reshape(1, -1))

    return call


def fused_tok_conv(x, w, b, gelu=True, interpret=False):
    """x: (B, T, 7, 7, Ci) bf16; w: (kT, 3, 3, Ci, Co); b: (Co,).
    Valid-T / pad-1-spatial conv + bias (+ exact-erf GeLU)."""
    return _make_tok(x.shape[1], x.shape[2], w.shape[0], bool(interpret),
                     bool(gelu))(x, w, b)


def _xla_reference(x, w, b, gelu=True):
    import jax
    import jax.numpy as jnp

    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    if gelu:
        y32 = y.astype(jnp.float32)
        y = (y32 * 0.5 * (1.0 + jax.lax.erf(y32 * 0.7071067811865476))
             ).astype(y.dtype)
    return y


def main() -> None:
    import jax
    import jax.numpy as jnp

    interpret = os.environ.get("PROTO_INTERPRET", "0") == "1"
    bsz = int(os.environ.get("PROTO_B", "64"))
    ci, co = (2048, 768) if not interpret else (256, 128)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bsz, 16, 7, 7, ci) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(5, 3, 3, ci, co) * 0.01, jnp.bfloat16)
    b = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)

    got = np.asarray(fused_tok_conv(x, w, b, interpret=interpret),
                     np.float32)
    want = np.asarray(jax.jit(_xla_reference)(x, w, b), np.float32)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    print(f"numerics rel: {err:.2e}  (shape {got.shape})")
    assert err < 2e-2

    if interpret:
        return

    fused = jax.jit(lambda *a: jnp.sum(
        fused_tok_conv(*a).astype(jnp.float32)))
    ref = jax.jit(lambda *a: jnp.sum(
        _xla_reference(*a).astype(jnp.float32)))
    for name, fn in (("fused", fused), ("xla", ref)):
        float(fn(x, w, b))
        t0 = time.perf_counter()
        outs = [fn(x, w, b) for _ in range(10)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / 10
        tf = 2 * bsz * 12 * 49 * 45 * ci * co / 1e12
        print(f"{name:6s} {dt * 1e3:8.2f} ms  ({tf / dt:.0f} TFLOP/s)")


if __name__ == "__main__":
    main()
