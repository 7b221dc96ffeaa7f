#!/usr/bin/env python
"""Profile the on-device batched augmentation pipeline in isolation.

The published recipes train with --augmentType rand_aug
(``README.md:48-51``); the batched implementation (data/transforms.py)
already took the per-clip vmap path from 6592 -> 264 ms per b32 batch
(round 2), but at recipe config it is still comparable to the whole train
step — this tool times rand_aug / aug_mix at a given batch size with the
enqueue-N/fetch-one protocol and optionally captures a profiler trace
(SHGVQA_BENCH_PROFILE=/tmp/prof_aug) for tools/parse_xplane.py.

Usage: python tools/profile_augment.py [rand_aug|aug_mix] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    if (os.environ.get("SHGVQA_RBG", "1") == "1"
            and jax.devices()[0].platform in ("tpu", "axon")):
        jax.config.update("jax_default_prng_impl", "rbg")

    from shgvqa_tpu.data.transforms import (
        NORM_STATS,
        aug_mix_batch,
        normalize_clip,
        rand_augment_batch,
    )

    kind = sys.argv[1] if len(sys.argv) > 1 else "rand_aug"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    eq_stride = int(os.environ.get("SHGVQA_EQ_STRIDE", "8"))
    rng = np.random.RandomState(0)
    frames = rng.randint(
        0, 256, (batch_size, 16, 224, 224, 3)).astype(np.uint8)
    frames = jax.device_put(frames)
    mean, std = NORM_STATS["slow_r50"]

    @jax.jit
    def f(frames, key):
        x = frames.astype(jnp.float32) / 255.0
        keys = jax.random.split(key, x.shape[0])
        if kind == "aug_mix":
            x = aug_mix_batch(x, keys, eq_stride=eq_stride)
        else:
            x = rand_augment_batch(x, keys, eq_stride=eq_stride)
        return normalize_clip(x, mean, std).sum()

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    out = f(frames, key)
    _ = float(out)
    compile_s = time.perf_counter() - t0

    prof = os.environ.get("SHGVQA_BENCH_PROFILE")
    if prof:
        jax.profiler.start_trace(prof)
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(frames, jax.random.fold_in(key, i))
    _ = float(out)
    dt = time.perf_counter() - t0
    if prof:
        jax.profiler.stop_trace()

    print(json.dumps({
        "metric": f"{kind} b{batch_size} eq_stride{eq_stride}",
        "value": round(1000 * dt / iters, 1),
        "unit": "ms/batch",
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
