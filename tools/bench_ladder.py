#!/usr/bin/env python
"""Step-ladder timing of the train step's segments on the real device.

Times (enqueue-N, fetch-one-scalar protocol) progressively larger jitted
subgraphs of the flagship HGQA train step so wall time — which on the axon
relay includes per-thunk dispatch — can be attributed to pipeline segments:

  0. augment + normalize (the in-graph RandAugment train path)
  1. backbone forward only (frozen slow_r50, normalized frames)
  2. head forward (tri-stream encoder + decoders + HGQ cross), feats fixed
  3. losses only (Hungarian matching + set CE + bce) from fixed outputs
  4. full forward + backward (grads, no optimizer)
  5. full train step (grads + BertAdam update)

Differences between rungs isolate each segment's wall cost, dispatch
included.  Prints one JSON line.  SHGVQA_BENCH_PALLAS=1 for the fused
attention path; SHGVQA_BENCH_TRAIN_BATCH to change batch size.
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

    from __graft_entry__ import _example_batch, _flagship_cfg
    from shgvqa_tpu.data.transforms import (
        NORM_STATS,
        normalize_clip,
        rand_augment_batch,
    )
    from shgvqa_tpu.models.backbone import make_backbone
    from shgvqa_tpu.models.shgvqa import ShgVqaModel, VideoShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses

    use_pallas = os.environ.get("SHGVQA_BENCH_PALLAS", "0") == "1"
    if use_pallas:
        from shgvqa_tpu.kernels import attention as pallas_attn

        pallas_attn.enable(True)

    batch_size = int(os.environ.get("SHGVQA_BENCH_TRAIN_BATCH", "32"))
    cfg = _flagship_cfg().replace(freeze_backbone=True)
    if use_pallas:
        cfg = cfg.replace(use_pallas_attention=True)
    os.environ.setdefault("SHGVQA_FLAT_OPT", "1")
    model = VideoShgVqaModel(cfg)
    tx = make_optimizer(lr=1e-5, t_total=1000, warmup=0.1, flat=True)

    batch = _example_batch(cfg, batch_size=batch_size, with_labels=True)
    batch["frames"] = (batch["frames"] * 255.0).astype(np.uint8)
    batch = jax.device_put(batch)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
        rng, batch)
    opt_state = tx.init(params)

    iters = int(os.environ.get("SHGVQA_LADDER_ITERS", "20"))

    def timeit(fn, *args):
        out = fn(*args)                       # compile
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return 1000 * (time.perf_counter() - t0) / iters

    class _Results(dict):
        def __setitem__(self, k, v):   # print incrementally: rungs are slow
            super().__setitem__(k, v)
            print(f"{k}: {v:.1f}", flush=True)

    results = _Results()
    mean, std = NORM_STATS.get(cfg.backbone, NORM_STATS["slow_r50"])

    # NOTE on outputs: the relay pays per-call handle/transfer cost
    # proportional to OUTPUT size for non-donated results (round-2 ladder
    # v1: returning the 308MB augmented frames measured 7.6s/call; the same
    # graph reduced to a scalar is ms-scale).  Every rung therefore reduces
    # its result to a scalar INSIDE the jit; a separate `_materialized`
    # variant would measure the relay, not the graph.

    # 0. augment + normalize (train-mode in-graph path)
    @jax.jit
    def f_aug(frames, key):
        x = frames.astype(jnp.float32) / 255.0
        keys = jax.random.split(key, x.shape[0])
        x = rand_augment_batch(x, keys)
        return normalize_clip(x, mean, std).sum()

    results["augment_ms"] = timeit(f_aug, batch["frames"], rng)

    # 1. backbone forward (from normalized frames)
    bb = make_backbone(cfg.backbone, dtype=jnp.bfloat16)
    bb_params = {"params": params["params"]["backbone"]}
    if "batch_stats" in params:
        bb_params["batch_stats"] = params["batch_stats"]["backbone"]
    normed = jax.jit(lambda f: normalize_clip(
        f.astype(jnp.float32) / 255.0, mean, std))(batch["frames"])
    f_bb_scalar = jax.jit(lambda p, x: bb.apply(p, x).sum())
    results["backbone_fwd_ms"] = timeit(f_bb_scalar, bb_params, normed)
    f_bb = jax.jit(bb.apply)

    # 2. head forward from precomputed visual feats
    head = ShgVqaModel(cfg)
    head_params = {"params": params["params"]["head"]}
    feats = f_bb(bb_params, normed)
    head_batch = {k: v for k, v in batch.items() if k != "frames"}
    head_batch["visual_feats"] = feats
    f_head = jax.jit(lambda p, b: head.apply(
        p, b, deterministic=True)["hg_logit"])
    results["head_fwd_ms"] = timeit(f_head, head_params, head_batch)

    # 3. losses only from fixed outputs
    outputs = jax.jit(lambda p, b: head.apply(p, b, deterministic=True))(
        head_params, head_batch)
    f_loss = jax.jit(lambda o, b: compute_losses(cfg, o, b)[0])
    results["losses_ms"] = timeit(f_loss, outputs, head_batch)

    # 4. full forward + backward
    def loss_fn(p, b, k):
        kd, ka = jax.random.split(k)
        out = model.apply(p, b, deterministic=False,
                          rngs={"dropout": kd, "augment": ka})
        return compute_losses(cfg, out, b)

    # keep the grads live (reduce to a norm) or XLA DCEs the whole backward
    def _loss_and_gnorm(p, b, k):
        (l, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, b, k)
        return l + optax.global_norm(grads)

    f_grad = jax.jit(_loss_and_gnorm)
    results["fwd_bwd_ms"] = timeit(f_grad, params, batch, rng)

    # 5. full train step
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, o, b, k):
        (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, b, k)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, m["total_loss"]

    # free earlier rungs' buffers: the train step needs most of HBM
    del outputs, feats, normed, head_batch, head_params, bb_params
    p, o = params, opt_state        # donated; not reused afterwards
    p, o, l = train_step(p, o, batch, rng)
    _ = float(l)
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, l = train_step(p, o, batch, jax.random.fold_in(rng, i))
    _ = float(l)
    results["train_step_ms"] = 1000 * (time.perf_counter() - t0) / iters

    results = {k: round(v, 1) for k, v in results.items()}
    results["batch"] = batch_size
    results["pallas"] = use_pallas
    print(json.dumps(results))


if __name__ == "__main__":
    main()
