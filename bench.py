"""Benchmark: end-to-end clips/sec/chip, frames -> answer (BASELINE.json
north star).

Runs the flagship HGQA inference path at published dims — uint8 frames (the
data pipeline's real dtype) through on-device normalization, the slow_r50
backbone, bert-base tri-stream encoder, both HG decoders, and the HG cross
encoder — on the available accelerator and prints ONE JSON line.

Timing protocol for remote-relay TPU backends: the device stream executes
enqueued programs in order, but a host fetch costs hundreds of ms of relay
latency regardless of size — so all iterations are enqueued and ONE scalar
is fetched at the end.  (block_until_ready returns early through the relay.)

The reference never measured throughput (SURVEY.md §6); vs_baseline is fixed
at 1.0 for the first recorded value and improvements are tracked across
rounds via BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _example_batch, _flagship_cfg
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    base_cfg = _flagship_cfg()
    cfg = base_cfg
    # int8 frozen trunk is the DEFAULT benched inference path since round 4:
    # 429.1 vs 330.2 clips/s/chip bf16 on-chip (+30%), numerics recorded in
    # PERF.md (tools/quant_numerics.py; trained-accuracy preservation in
    # tests/test_quant_backbone.py).  SHGVQA_BENCH_QUANT= (empty) re-runs
    # the bf16 trunk.  A same-run bf16 CONTROL rides along in the JSON's
    # "control" field so the artifact series stays like-for-like
    # (SHGVQA_BENCH_CONTROL=0 skips it).
    quant = os.environ.get("SHGVQA_BENCH_QUANT", "int8")
    if quant:
        # int8 frozen trunk (models/backbone.py SlowR50.quant): init below
        # doubles as the activation-scale calibration pass
        cfg = cfg.replace(quant_backbone=quant, freeze_backbone=True)
    if os.environ.get("SHGVQA_BENCH_PALLAS", "0") == "1":
        from shgvqa_tpu.kernels import attention as pallas_attn

        pallas_attn.enable(True)
        cfg = cfg.replace(use_pallas_attention=True)
    if os.environ.get("SHGVQA_BENCH_PALLAS_DEC", "0") == "1":
        # decoder-scoped fused attention: measured SLOWER (316 vs 328
        # clips/s) — the DETR MHA softmax does lower to a pathological
        # transposed-layout convert (~3 ms at b32), but 20 small kernel
        # launches cost more.  Kept opt-in as a recorded negative result.
        from shgvqa_tpu.kernels import attention as pallas_attn

        pallas_attn.enable_decoder(True)
    if os.environ.get("SHGVQA_BENCH_PALLAS_FFN", "1") == "1":
        # fused FFN block (kernels/ffn.py): one Pallas call per site on the
        # deterministic path; A/B'd on-chip round 2
        from shgvqa_tpu.kernels import ffn as pallas_ffn

        pallas_ffn.enable(True)
    rng = jax.random.PRNGKey(0)

    batch_sizes = [int(x) for x in os.environ.get(
        "SHGVQA_BENCH_BATCHES", "32,64").split(",")]

    def make_batch(mcfg, batch_size, seed):
        b = _example_batch(mcfg, batch_size=batch_size, seed=seed)
        # uint8 frames: the input pipeline's actual dtype (PNG decode);
        # normalization happens on device inside the model
        b["frames"] = (b["frames"] * 255.0).astype(np.uint8)
        return b

    def measure(mcfg):
        """(best clips/s, batch) for one model config over batch_sizes."""
        model = VideoShgVqaModel(mcfg)
        # params are batch-size independent: init once at size 1
        params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
            rng, make_batch(mcfg, 1, 0))
        best = (0.0, 0)
        for batch_size in batch_sizes:
          try:
            # stage inputs on device ONCE: the relay's host->device path is
            # ~100MB/s; a real input pipeline overlaps transfers and compute
            batch = jax.device_put(make_batch(mcfg, batch_size, 0))
            batch2 = jax.device_put(make_batch(mcfg, batch_size, 1))

            @jax.jit
            def forward(params, batch):
                out = model.apply(params, batch, deterministic=True)
                return jnp.argmax(out["hg_logit"], axis=-1)

            _ = int(forward(params, batch)[0])   # compile

            iters = 50
            inputs = [batch, batch2]
            t0 = time.perf_counter()
            outs = []
            for i in range(iters):
                outs.append(forward(params, inputs[i % 2]))
            _ = int(outs[-1][0])                 # one fetch drains the queue
            dt = time.perf_counter() - t0
            cps = batch_size * iters / dt
            if cps > best[0]:
                best = (cps, batch_size)
          except Exception as e:  # noqa: BLE001 — skip OOM'd sizes
            print(f"batch {batch_size} failed ({type(e).__name__}); "
                  "skipping", flush=True)
        return best

    best = measure(cfg)
    n_chips = max(1, jax.device_count())
    tag = f"bf16, {quant} trunk" if quant else "bf16"
    record = {
        "metric": f"clips/sec/chip (uint8 frames->answer, HGQA b{best[1]} "
                  f"{tag})",
        "value": round(best[0] / n_chips, 2),
        "unit": "clips/s/chip",
        "vs_baseline": 1.0,
    }
    if quant and os.environ.get("SHGVQA_BENCH_CONTROL", "1") == "1":
        # same-day bf16 control in the same artifact: keeps the BENCH
        # series comparable across the r04 headline-definition change
        ctrl = measure(base_cfg)
        record["control"] = {
            "metric": f"clips/sec/chip (HGQA b{ctrl[1]} bf16 trunk)",
            "value": round(ctrl[0] / n_chips, 2),
        }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
