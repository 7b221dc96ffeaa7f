#!/usr/bin/env python
"""A/B prototype: batched equalize without sorts / 256-wide selects.

Current op_equalize_batch (b64 rand_aug profile): the sort+searchsorted CDF
costs 2x52 ms + ~2x21 ms of while/searchsorted tails, and the one-hot
"MXU LUT" apply actually lowers to a select_reduce VPU fusion doing 256
compare+select+adds per pixel (2x100 ms).  Candidates here:

- cdf_gram: hist2d[h,l] = sum_p onehot_hi * onehot_lo as an einsum
  contracting over PIXELS (K~100k, M=N=16) — a true MXU gram matmul; cdf =
  cumsum.  Exact: counts accumulate in f32 (< 2^24).
- apply_nibble: out = sum_h 1[hi==h] * (sum_l 1[lo==l] * lut2[h,l]) with the
  inner contraction a (P,16)x(16,16) dot — 16-wide stages instead of one
  256-wide select_reduce.

Usage: python tools/proto_equalize.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.data.transforms import op_equalize_batch

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    stride = int(os.environ.get("SHGVQA_EQ_STRIDE", "8"))
    rng = np.random.RandomState(0)
    x = (rng.randint(0, 256, (b, 16, 224, 224, 3)) / 255.0).astype(
        np.float32)
    x = jax.device_put(x)

    def new_equalize(x, stride=stride, barrier=True):
        bb, t, h, w, c = x.shape
        q = jnp.clip(jnp.floor(x * 255.0), 0, 255).astype(jnp.int32)
        qc = q.transpose(0, 4, 1, 2, 3).reshape(bb, c, -1)      # (B, C, P)
        sub = qc[:, :, ::stride]
        hi = (sub >> 4)[..., None] == jnp.arange(16, dtype=jnp.int32)
        lo = (sub & 15)[..., None] == jnp.arange(16, dtype=jnp.int32)
        hist2 = jnp.einsum(
            "bcph,bcpl->bchl", hi.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)                 # (B,C,16,16)
        cdf = jnp.cumsum(hist2.reshape(bb, c, 256), axis=-1)
        hist = hist2.reshape(bb, c, 256)
        nz_min = jnp.min(jnp.where(hist > 0, cdf, jnp.inf), axis=-1,
                         keepdims=True)
        total = cdf[..., -1:]
        denom = jnp.maximum(total - nz_min, 1.0)
        lut = jnp.clip(jnp.round((cdf - nz_min) / denom * 255.0), 0, 255)

        # nibble apply
        lut2 = lut.reshape(bb, c, 16, 16).astype(jnp.bfloat16)  # [hi, lo]
        ohl = ((qc & 15)[..., None] == jnp.arange(16, dtype=jnp.int32)
               ).astype(jnp.bfloat16)                           # (B,C,P,16)
        if barrier:
            ohl = jax.lax.optimization_barrier(ohl)
        tmp = jnp.einsum("bcpl,bchl->bcph", ohl, lut2,
                         preferred_element_type=jnp.bfloat16)   # (B,C,P,16)
        ohh = (qc >> 4)[..., None] == jnp.arange(16, dtype=jnp.int32)
        out = jnp.sum(jnp.where(ohh, tmp, jnp.bfloat16(0)),
                      axis=-1).astype(jnp.float32)              # (B,C,P)
        out = out.reshape(bb, c, t, h, w).transpose(0, 2, 3, 4, 1)
        return out.astype(x.dtype) / 255.0

    def timeit(f, *a):
        out = f(*a)
        _ = float(out)
        t0 = time.perf_counter()
        n = 10
        for _i in range(n):
            out = f(*a)
        _ = float(out)
        return 1000 * (time.perf_counter() - t0) / n

    f_old = jax.jit(lambda x: op_equalize_batch(x, stride=stride).sum())
    f_new = jax.jit(lambda x: new_equalize(x, barrier=True).sum())
    f_new_nb = jax.jit(lambda x: new_equalize(x, barrier=False).sum())

    # exactness vs the current implementation on a small slice (on-device)
    xs = x[:2]
    a = np.asarray(jax.jit(
        lambda x: op_equalize_batch(x, stride=stride))(xs))
    bnew = np.asarray(jax.jit(
        lambda x: new_equalize(x, barrier=True))(xs))
    exact = np.array_equal(a, bnew)
    print(f"exact_match_vs_current: {exact} "
          f"(maxdiff {np.abs(a - bnew).max():.3e})", flush=True)

    print(f"old_ms: {timeit(f_old, x):.1f}", flush=True)
    print(f"new_barrier_ms: {timeit(f_new, x):.1f}", flush=True)
    print(f"new_nobarrier_ms: {timeit(f_new_nb, x):.1f}", flush=True)


if __name__ == "__main__":
    main()
