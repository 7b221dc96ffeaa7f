#!/usr/bin/env python
"""Microbenchmarks for hot-op reformulations (decoder MHA, tokenizer conv).

Times standalone variants of the profiled hot spots at flagship dims on the
real chip, using the enqueue-N/fetch-one-scalar protocol (the relay returns
early from block_until_ready).  Each variant returns a scalar reduction so
no large outputs cross the relay.

Usage: python tools/bench_micro.py [mha|tok|all]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, iters=20, warmup=2):
    import jax.numpy as jnp

    for _ in range(warmup):
        r = fn(*args)
    float(r)  # sync
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    s = float(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    del s
    return dt * 1e3


def bench_mha() -> None:
    """DETR decoder MHA score/softmax/apply variants.

    Profiled pathology (b64): the softmax output materializes as a
    transposed-layout bf16[64,12,128,128] kLoop convert costing 6.6 ms."""
    import jax
    import jax.numpy as jnp

    b, h, lq, lk, hd = 64, 12, 128, 128, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, lq, h, hd), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, lk, h, hd), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, lk, h, hd), jnp.bfloat16)
    mask = jnp.asarray(rng.randn(lq, lk) < 0, jnp.float32) * -10000.0

    @jax.jit
    def current(q, k, v):
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def prescaled_f32probs(q, k, v):
        qs = (q.astype(jnp.float32) / np.sqrt(hd)).astype(jnp.bfloat16)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qs, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores + mask, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(jnp.bfloat16), v)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def swapped_second(q, k, v):
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        probs = jax.nn.softmax(scores / np.sqrt(hd) + mask, axis=-1)
        out = jnp.einsum("bkhd,bhqk->bqhd", v, probs.astype(jnp.bfloat16))
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def bhld_layout(q, k, v):
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores / np.sqrt(hd) + mask, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(jnp.bfloat16), vt)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def sdpa(q, k, v):
        out = jax.nn.dot_product_attention(
            q, k, v, bias=mask[None, None], implementation="xla")
        return jnp.sum(out.astype(jnp.float32))

    for name, fn in [("current", current),
                     ("prescaled_f32probs", prescaled_f32probs),
                     ("swapped_second", swapped_second),
                     ("bhld_layout", bhld_layout),
                     ("jax.nn.sdpa", sdpa)]:
        try:
            ms = _time(fn, (q, k, v))
            print(f"  mha {name:22s} {ms:8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  mha {name:22s} FAILED {type(e).__name__}: {e}")


def bench_tok() -> None:
    """Visual tokenizer conv1 variants: (64,16,7,7,2048) -> (64,12,7,7,768),
    kernel (5,3,3), valid-T / pad-1 spatial.  Profiled 27.5 ms at b64."""
    import jax
    import jax.numpy as jnp

    b, t, s, ci, co = 64, 16, 7, 2048, 768
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, s, s, ci) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(5, 3, 3, ci, co) * 0.01, jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    @jax.jit
    def current(x, w):
        return jnp.sum(conv(x, w).astype(jnp.float32))

    @jax.jit
    def temporal_slices(x, w):
        # 5 separate (1,3,3) convs on temporal slices, summed
        acc = None
        for dt in range(5):
            y = jax.lax.conv_general_dilated(
                x[:, dt:dt + 12], w[dt:dt + 1],
                window_strides=(1, 1, 1),
                padding=((0, 0), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            acc = y if acc is None else acc + y
        return jnp.sum(acc.astype(jnp.float32))

    @jax.jit
    def spatial_folded(x, w):
        # fold (t) into batch per temporal tap; 3x3 conv in NHWC 2D
        acc = None
        for dt in range(5):
            xs = x[:, dt:dt + 12].reshape(b * 12, s, s, ci)
            y = jax.lax.conv_general_dilated(
                xs, w[dt], window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = y if acc is None else acc + y
        return jnp.sum(acc.astype(jnp.float32))

    @jax.jit
    def taps_matmul(x, w):
        # 45 shifted dots in f32 accumulation (what a pallas kernel would
        # do, expressed in XLA): pad spatially once, slice per tap
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((b, 12, s, s, co), jnp.float32)
        for dt in range(5):
            for dy in range(3):
                for dx in range(3):
                    xs = xp[:, dt:dt + 12, dy:dy + s, dx:dx + s, :]
                    acc = acc + jnp.einsum(
                        "btyxc,co->btyxo", xs, w[dt, dy, dx],
                        preferred_element_type=jnp.float32)
        return jnp.sum(acc)

    for name, fn in [("current_ndhwc", current),
                     ("temporal_slices", temporal_slices),
                     ("spatial_folded_2d", spatial_folded),
                     ("taps_matmul", taps_matmul)]:
        try:
            ms = _time(fn, (x, w), iters=10)
            print(f"  tok {name:22s} {ms:8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  tok {name:22s} FAILED {type(e).__name__}: {e}")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("mha", "all"):
        print("decoder MHA (b64, h12, 128x128, hd64):")
        bench_mha()
    if which in ("tok", "all"):
        print("tokenizer conv1 (64,16,7,7,2048)->(64,12,7,7,768):")
        bench_tok()


if __name__ == "__main__":
    main()
