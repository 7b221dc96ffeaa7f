#!/usr/bin/env python
"""Prototype: flat-major train state vs tree-state train step.

Today's train step keeps params as a ~200-leaf tree; the flat optimizer then
pays ravel(grads) + unravel(updates) + per-leaf apply_updates every step —
~500 small thunks, ~140 ms of relay dispatch at b32 (tools/bench_ladder.py).

Flat-major inverts it: the TRAIN STATE is one lane-aligned f32 vector; the
model tree is materialized by unravel INSIDE the jit (~200 slices feeding
the forward), gradients come out already flat (the cotangent of ravel is one
concat), and the optimizer + apply are ~12 big fused ops with full donation.

Prints both step times; promoted into train/ if the win is real.
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
    import jax.numpy as jnp
    import optax

    from shgvqa_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from jax.flatten_util import ravel_pytree

    from __graft_entry__ import _example_batch, _flagship_cfg
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses

    batch_size = int(os.environ.get("SHGVQA_BENCH_TRAIN_BATCH", "32"))
    use_pallas = os.environ.get("SHGVQA_BENCH_PALLAS", "0") == "1"
    cfg = _flagship_cfg().replace(freeze_backbone=True)
    if use_pallas:
        from shgvqa_tpu.kernels import attention as pallas_attn

        pallas_attn.enable(True)
        cfg = cfg.replace(use_pallas_attention=True)
    model = VideoShgVqaModel(cfg)

    batch = _example_batch(cfg, batch_size=batch_size, with_labels=True)
    batch["frames"] = (batch["frames"] * 255.0).astype(np.uint8)
    batch = jax.device_put(batch)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
        rng, batch)

    def loss_fn(p, b, k):
        kd, ka = jax.random.split(k)
        out = model.apply(p, b, deterministic=False,
                          rngs={"dropout": kd, "augment": ka})
        return compute_losses(cfg, out, b)

    iters = 20
    results = {}

    # ---- baseline: tree state + flat optimizer (today's path) -------------
    if os.environ.get("SHGVQA_PROTO_SKIP_TREE", "0") != "1":
        tx = make_optimizer(lr=1e-5, t_total=1000, warmup=0.1, flat=True)
        opt_state = tx.init(params)

        @partial(jax.jit, donate_argnums=(0, 1))
        def tree_step(p, o, b, k):
            (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, b, k)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, m["total_loss"]

        p, o = params, opt_state
        t0 = time.perf_counter()
        p, o, l = tree_step(p, o, batch, rng)
        _ = float(l)
        results["tree_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        for i in range(iters):
            p, o, l = tree_step(p, o, batch, jax.random.fold_in(rng, i))
        _ = float(l)
        results["tree_step_ms"] = round(
            1000 * (time.perf_counter() - t0) / iters, 1)
        print(json.dumps(results), flush=True)
        del p, o
        params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
            rng, batch)

    # ---- flat-major: params themselves are one vector ---------------------
    flat0, unravel = ravel_pytree(params)
    del params

    LANES = 256
    n = flat0.shape[0]
    padded = (n + LANES - 1) // LANES * LANES

    def pad2d(v):
        return jnp.zeros((padded,), v.dtype).at[:n].set(v).reshape(-1, LANES)

    lr, t_total, warmup = 1e-5, 1000, 0.1
    b1, b2, eps, wd, clip = 0.9, 0.999, 1e-6, 0.01, 5.0

    from shgvqa_tpu.train.optimizer import warmup_linear

    state = {
        "flat": pad2d(flat0),
        "m": jnp.zeros((padded // LANES, LANES), jnp.float32),
        "v": jnp.zeros((padded // LANES, LANES), jnp.float32),
        "step": jnp.zeros((), jnp.int32),
    }
    state = jax.device_put(state)

    @partial(jax.jit, donate_argnums=(0,))
    def flat_step(st, b, k):
        def loss_flat(flat2d):
            p = unravel(flat2d.reshape(-1)[:n])
            return loss_fn(p, b, k)

        (_, mets), g = jax.value_and_grad(
            loss_flat, has_aux=True)(st["flat"])
        gnorm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
        g = g * jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        m = b1 * st["m"] + (1.0 - b1) * g
        v = b2 * st["v"] + (1.0 - b2) * g * g
        progress = st["step"].astype(jnp.float32) / float(t_total)
        lr_t = lr * warmup_linear(progress, warmup)
        upd = -lr_t * (m / (jnp.sqrt(v) + eps) + wd * st["flat"])
        return {
            "flat": st["flat"] + upd, "m": m, "v": v, "step": st["step"] + 1,
        }, mets["total_loss"]

    t0 = time.perf_counter()
    state, l = flat_step(state, batch, rng)
    _ = float(l)
    results["flat_compile_s"] = round(time.perf_counter() - t0, 1)
    prof = os.environ.get("SHGVQA_BENCH_PROFILE")
    if prof:
        jax.profiler.start_trace(prof)
    t0 = time.perf_counter()
    for i in range(iters):
        state, l = flat_step(state, batch, jax.random.fold_in(rng, i))
    _ = float(l)
    if prof:
        jax.profiler.stop_trace()
    results["flat_step_ms"] = round(
        1000 * (time.perf_counter() - t0) / iters, 1)
    results["batch"] = batch_size
    results["pallas"] = use_pallas
    print(json.dumps(results))


if __name__ == "__main__":
    main()
