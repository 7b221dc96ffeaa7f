#!/usr/bin/env python
"""Profile the FULL train step on the real TPU: wall vs device time, top
kernels, and MFU -- quantifies the dispatch-vs-compute split that caps
training throughput (round-1: 339 ms/step wall, ~135 ms device at b32)."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16 = 394e12


def device_time_from_trace(trace_dir, iters):
    device_us, top = 0.0, {}
    for path in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        pid_names = {}
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        dev_pids = {p for p, n in pid_names.items()
                    if "TPU" in n or "tpu" in n or "Device" in n}
        for ev in trace.get("traceEvents", []):
            if (ev.get("ph") == "X" and ev.get("pid") in dev_pids
                    and "dur" in ev):
                name = ev.get("name", "?")
                if name.startswith("jit_") or name == "program":
                    continue
                device_us += ev["dur"]
                top[name] = top.get(name, 0.0) + ev["dur"]
    return device_us / 1e6 / iters, top


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from shgvqa_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    # match the shipped driver/bench defaults: hardware rbg PRNG for dropout
    # bits (threefry mask generation alone is ~37 ms/layer at b32 in the
    # trace; SHGVQA_RBG=0 to profile the threefry path)
    if (os.environ.get("SHGVQA_RBG", "1") == "1"
            and jax.devices()[0].platform in ("tpu", "axon")):
        jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _example_batch, _flagship_cfg
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses

    bsz = int(os.environ.get("SHGVQA_PROFILE_BATCH", "32"))
    os.environ.setdefault("SHGVQA_FLAT_OPT", "1")
    scan = os.environ.get("SHGVQA_BENCH_SCAN", "0") == "1"
    remat_on = os.environ.get("SHGVQA_BENCH_REMAT", "0") == "1"
    cfg = _flagship_cfg(scan_layers=scan).replace(
        freeze_backbone=True, remat=remat_on)
    model = VideoShgVqaModel(cfg)
    tx = make_optimizer(lr=1e-5, t_total=1000, warmup=0.1, flat=True)

    batch = _example_batch(cfg, batch_size=bsz, seed=0, with_labels=True)
    batch["frames"] = (batch["frames"] * 255.0).astype(np.uint8)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
        rng, _example_batch(cfg, batch_size=1, seed=0, with_labels=True))
    opt_state = jax.jit(tx.init)(params)
    batch = jax.device_put(batch)

    def loss_fn(p, b, k):
        out = model.apply(p, b, deterministic=False, rngs={"dropout": k})
        total, metrics = compute_losses(cfg, out, b)
        return total, metrics

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, o, b, k):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, b, k)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, metrics["total_loss"]

    flops = None
    try:
        cost = train_step.lower(
            params, opt_state, batch, rng).compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"])
    except Exception as e:  # noqa: BLE001
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    key = jax.random.PRNGKey(1)
    params, opt_state, loss = train_step(params, opt_state, batch, key)
    _ = float(loss)  # compile + warm

    iters = 8
    trace_dir = "/tmp/prof_train"
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = train_step(
            params, opt_state, batch, jax.random.fold_in(key, i))
    _ = float(loss)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    per_iter = wall / iters
    dev_s, top = device_time_from_trace(trace_dir, iters)
    print(json.dumps({
        "batch": bsz,
        "wall_ms_per_step": round(per_iter * 1000, 1),
        "device_ms_per_step": round(dev_s * 1000, 1) if dev_s else None,
        "clips_per_s_wall": round(bsz / per_iter, 1),
        "clips_per_s_device": round(bsz / dev_s, 1) if dev_s else None,
        "xla_flops_per_step": flops,
        "mfu_device": (round(flops / dev_s / V5E_PEAK_BF16, 4)
                       if flops and dev_s else None),
        "n_kernels": len(top),
    }))
    for name, us in sorted(top.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {us / 1e3 / iters:9.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
