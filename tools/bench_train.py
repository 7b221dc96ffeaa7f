#!/usr/bin/env python
"""Training-throughput benchmark: full HGQA train step (backbone fwd+bwd +
tri-stream encoder + HG decoders + Hungarian losses + BertAdam) at published
AGQA dims, batch 32 (BASELINE.json config #4).

Prints one JSON line {metric, value, unit}.  Run separately from bench.py
(which measures frames->answer inference); the driver-recorded benchmark
stays bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import optax

    from shgvqa_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _example_batch, _flagship_cfg
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses

    batch_size = int(os.environ.get("SHGVQA_BENCH_TRAIN_BATCH", "32"))
    # frozen backbone is the STAR recipe (star.py:87-88) and avoids the
    # conv-backward path, which lowers ~50x slower than forward on this
    # platform (see axon-tpu notes); unfreeze with SHGVQA_BENCH_UNFREEZE=1
    freeze = os.environ.get("SHGVQA_BENCH_UNFREEZE", "0") != "1"
    # scan_layers default False: the relay's chipless AOT compile helper
    # historically crashed on the scanned BACKWARD graph (HTTP 500; the same
    # graph compiles and runs on local XLA backends).  A/B via env:
    scan = os.environ.get("SHGVQA_BENCH_SCAN", "0") == "1"
    remat_on = os.environ.get("SHGVQA_BENCH_REMAT", "0") == "1"
    cfg = _flagship_cfg(scan_layers=scan).replace(
        freeze_backbone=freeze, remat=remat_on)
    if os.environ.get("SHGVQA_BENCH_PALLAS", "0") == "1":
        from shgvqa_tpu.kernels import attention as pallas_attn

        pallas_attn.enable(True)
        cfg = cfg.replace(use_pallas_attention=True)
    os.environ.setdefault("SHGVQA_FLAT_OPT", "1")  # verified at flagship size
    model = VideoShgVqaModel(cfg)
    tx = make_optimizer(lr=1e-5, t_total=1000, warmup=0.1, flat=True)

    batch = _example_batch(cfg, batch_size=batch_size, with_labels=True)
    # uint8 frames (pipeline dtype); on-device normalization in the model
    batch["frames"] = (batch["frames"] * 255.0).astype(np.uint8)
    batch = jax.device_put(batch)   # stage once: relay h2d is ~100MB/s
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
        rng, batch)
    opt_state = tx.init(params)

    def loss_fn(p, b, k):
        kd, ka = jax.random.split(k)
        out = model.apply(p, b, deterministic=False,
                          rngs={"dropout": kd, "augment": ka})
        return compute_losses(cfg, out, b)

    # donate params/opt-state like the Trainer: reuses buffers in place,
    # which also avoids per-output handle churn through the remote relay
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, o, b, k):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, b, k)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, metrics["total_loss"]

    t0 = time.perf_counter()
    params, opt_state, loss = train_step(params, opt_state, batch, rng)
    _ = float(loss)
    compile_s = time.perf_counter() - t0

    # enqueue all steps, fetch one scalar at the end: per-fetch relay
    # latency (~0.3s) would otherwise dominate (device step is ms-scale)
    prof = os.environ.get("SHGVQA_BENCH_PROFILE")
    if prof:
        jax.profiler.start_trace(prof)
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = train_step(
            params, opt_state, batch, jax.random.fold_in(rng, i))
    _ = float(loss)
    dt = time.perf_counter() - t0
    if prof:
        jax.profiler.stop_trace()

    cps = batch_size * iters / dt / max(1, jax.device_count())
    print(json.dumps({
        "metric": f"train clips/sec/chip (HGQA b{batch_size} bf16)",
        "value": round(cps, 2),
        "unit": "clips/s/chip",
        "compile_s": round(compile_s, 1),
        "step_ms": round(1000 * dt / iters, 1),
    }))


if __name__ == "__main__":
    main()
