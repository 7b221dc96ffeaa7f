#!/usr/bin/env python
"""Profile the e2e inference bench on the real TPU and report MFU.

Captures a jax.profiler trace of the flagship frames->answer forward at
batch 32, sums device-side kernel time from the trace, and derives MFU from
an analytic FLOP count (jax.jit(...).lower().cost_analysis when available,
else the hand model).  Writes the trace under /tmp/prof_bench and prints a
JSON summary.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16 = 394e12  # fused mult-add counted as 2 FLOPs


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _example_batch, _flagship_cfg
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    cfg = _flagship_cfg()
    if os.environ.get("SHGVQA_BENCH_PALLAS_FFN", "1") == "1":
        # match bench.py's default config (fused FFN block on)
        from shgvqa_tpu.kernels import ffn as pallas_ffn

        pallas_ffn.enable(True)
    model = VideoShgVqaModel(cfg)
    rng = jax.random.PRNGKey(0)
    bsz = int(os.environ.get("SHGVQA_PROFILE_BATCH", "64"))

    batch = _example_batch(cfg, batch_size=bsz, seed=0)
    batch["frames"] = (batch["frames"] * 255.0).astype(np.uint8)
    params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
        rng, _example_batch(cfg, batch_size=1, seed=0))
    batch = jax.device_put(batch)

    @jax.jit
    def forward(params, batch):
        out = model.apply(params, batch, deterministic=True)
        return jnp.argmax(out["hg_logit"], axis=-1)

    # analytic cost from XLA itself
    flops = None
    try:
        cost = jax.jit(forward).lower(params, batch).compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"])
    except Exception as e:  # noqa: BLE001
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    _ = int(forward(params, batch)[0])  # compile + warm

    iters = 10
    trace_dir = "/tmp/prof_bench"
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    outs = [forward(params, batch) for _ in range(iters)]
    _ = int(outs[-1][0])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    # device-side time from the chrome trace: sum TensorFlow op durations on
    # the TPU device track
    device_us = 0.0
    top = {}
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
                # skip whole-program envelope events
                if name.startswith("jit_") or name == "program":
                    continue
                device_us += ev["dur"]
                top[name] = top.get(name, 0.0) + ev["dur"]

    per_iter_wall = wall / iters
    per_iter_dev = device_us / 1e6 / iters if device_us else None
    clips_s = bsz / per_iter_wall
    summary = {
        "batch": bsz,
        "wall_ms_per_iter": round(per_iter_wall * 1000, 2),
        "device_ms_per_iter": (round(per_iter_dev * 1000, 2)
                               if per_iter_dev else None),
        "clips_per_s_wall": round(clips_s, 1),
        "clips_per_s_device": (round(bsz / per_iter_dev, 1)
                               if per_iter_dev else None),
        "xla_flops_per_iter": flops,
        "mfu_wall": (round(flops / per_iter_wall / V5E_PEAK_BF16, 4)
                     if flops else None),
        "mfu_device": (round(flops / per_iter_dev / V5E_PEAK_BF16, 4)
                       if flops and per_iter_dev else None),
    }
    print(json.dumps(summary))
    for name, us in sorted(top.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us / 1e3 / iters:9.3f} ms/iter  {name[:110]}")


if __name__ == "__main__":
    main()
