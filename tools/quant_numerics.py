#!/usr/bin/env python
"""On-chip numerics of the int8 frozen backbone vs the bf16 trunk.

Round-3 verdict item 2: the int8 path (models/backbone.py SlowR50.quant)
landed with CPU correctness tests but no ON-CHIP numerics record.  This tool
runs the flagship HGQA model twice on the SAME weights and batch — once with
the bf16 trunk, once with the int8 trunk (init doubles as the calibration
pass) — and prints one JSON line:

  - argmax agreement of hg_logit (answer head) and of logit,
  - max / mean |delta| of hg_logit,
  - relative Frobenius error of the backbone features.

Run ON the TPU: python tools/quant_numerics.py  (CPU works too, slower).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _example_batch, _flagship_cfg
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    batch_size = int(os.environ.get("QN_BATCH", "32"))
    cfg = _flagship_cfg().replace(freeze_backbone=True)
    cfg_q = cfg.replace(quant_backbone="int8")

    model = VideoShgVqaModel(cfg)
    model_q = VideoShgVqaModel(cfg_q)

    batch = _example_batch(cfg, batch_size=batch_size, seed=0)
    batch["frames"] = (batch["frames"] * 255.0).astype(np.uint8)
    batch = jax.device_put(batch)

    rng = jax.random.PRNGKey(0)
    # identical weights: init the bf16 model, then run the QUANT model's
    # init on the same rng — param/batch_stats trees are flag-identical
    # (tests/test_quant_backbone.py), and the quant init doubles as the
    # activation-scale calibration pass over this batch
    params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
        rng, batch)
    params_q = jax.jit(lambda r, b: model_q.init(r, b, deterministic=True))(
        rng, batch)
    # transplant the calibrated scales onto the bf16 weights so BOTH runs
    # use byte-identical float parameters
    params_q = dict(params, quant_stats=params_q["quant_stats"])

    @jax.jit
    def fwd_plain(p, b):
        out = model.apply(p, b, deterministic=True)
        return out["hg_logit"], out["logit"]

    @jax.jit
    def fwd_quant(p, b):
        out = model_q.apply(p, b, deterministic=True)
        return out["hg_logit"], out["logit"]

    hg, logit = jax.device_get(fwd_plain(params, batch))
    hg_q, logit_q = jax.device_get(fwd_quant(params_q, batch))

    d = np.abs(hg.astype(np.float64) - hg_q.astype(np.float64))
    rel = np.linalg.norm(d) / max(np.linalg.norm(hg.astype(np.float64)),
                                  1e-12)
    out = {
        "batch": batch_size,
        "platform": jax.devices()[0].platform,
        "hg_argmax_agree": float(
            (hg.argmax(-1) == hg_q.argmax(-1)).mean()),
        "logit_argmax_agree": float(
            (logit.argmax(-1) == logit_q.argmax(-1)).mean()),
        "hg_logit_max_abs_delta": float(d.max()),
        "hg_logit_mean_abs_delta": float(d.mean()),
        "hg_logit_rel_fro": float(rel),
        "hg_logit_abs_mean": float(np.abs(hg).mean()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
