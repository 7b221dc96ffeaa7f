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

Trained-weights mode (round-4 verdict item 6 — "no trained-flagship-weights
int8-vs-bf16 accuracy delta exists anywhere"): set ``QN_CKPT`` to an orbax
checkpoint written by the product driver (``{output}/CURRENT`` etc.) and
``QN_ARGS`` to the SAME CLI flags the training run used.  The tool rebuilds
the driver's config + synthetic valid split, restores the trained weights,
re-runs the int8 activation-scale calibration against the TRAINED trunk on
the first valid batch, and scores the full valid split twice through
``Trainer.predict`` — answer accuracy, hg-head accuracy, Hungarian-matched
rel/act class accuracy, and per-question answer agreement between the two
trunks.  One JSON line again.
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


def main_trained(ckpt: str) -> None:
    """int8-vs-bf16 at TRAINED weights through the real eval path."""
    import shlex

    import jax

    from shgvqa_tpu.cli.common import (
        _example_from,
        build_data,
        build_item_source,
        build_tokenizer,
        make_model,
        parse_reference_flags_with_extras,
        resolve_num_answers,
    )
    from shgvqa_tpu.data.pipeline import Batcher, prefetch
    from shgvqa_tpu.train.loop import Trainer

    argv = shlex.split(os.environ.get(
        "QN_ARGS",
        "--taskHGQA --train train --valid valid --noCaps --fromScratch "
        "--syntheticData 320 --syntheticValid 32 --batchSize 32 "
        "--output /tmp/qn_eval"))
    cfg, extras = parse_reference_flags_with_extras(argv, dataset="agqa")
    # scratch output: the Trainer writes log.log/checkpoints under
    # cfg.output — never into the training run's directory
    cfg = cfg.replace(output=os.environ.get("QN_OUT", "/tmp/qn_eval_out"))
    # the answer vocab comes off the train split exactly like run_driver
    train_data = build_data(cfg, extras, cfg.data.train_split)
    cfg = resolve_num_answers(cfg, train_data)
    tokenizer = build_tokenizer(
        cfg, extras, [x["question"] for x in train_data.datums])
    valid_data = build_data(cfg, extras, cfg.data.valid_split)
    valid_src = build_item_source(cfg, extras, valid_data, tokenizer)
    batcher = Batcher(valid_src, num_items=len(valid_src),
                      batch_size=cfg.optim.eval_batch_size,
                      shuffle=False, seed=cfg.seed)
    evaluator = valid_data.evaluator()

    def score(trainer):
        q2a, hg_q2a, hg_acc = trainer.predict(
            prefetch(batcher.epoch(0)), return_hg_metrics=True)
        return {
            "acc": evaluator.evaluate_overall(q2a),
            "hg_acc": evaluator.evaluate_overall(hg_q2a),
            "rel_class_acc": hg_acc["rel_class_acc"] if hg_acc else None,
            "act_class_acc": hg_acc["act_class_acc"] if hg_acc else None,
            "q2a": q2a,
            "hg_q2a": hg_q2a,
        }

    # bf16 trunk: restore the trained checkpoint through the product path
    cfg_b = cfg.replace(quant_backbone="")
    tr_b = Trainer(cfg_b, steps_per_epoch=1,
                   model=make_model(cfg_b, has_frames=True))
    tr_b.init_params(_example_from(batcher))
    tr_b.load(ckpt)
    trained_vars = tr_b.params      # {"params", "batch_stats", ...}
    out_b = score(tr_b)

    # int8 trunk: SAME trained floats; the activation scales are
    # re-calibrated against the TRAINED trunk (an apply with mutable
    # quant_stats IS the calibration pass, models/backbone.py) — the
    # init-time scales would reflect random-init weights
    cfg_q = cfg.replace(quant_backbone="int8")
    tr_q = Trainer(cfg_q, steps_per_epoch=1,
                   model=make_model(cfg_q, has_frames=True))
    first = dict(next(iter(batcher.epoch(0))))
    first.pop("ques_id", None)
    first.pop("n_valid", None)
    first = jax.device_put(first)
    calib_vars = {k: v for k, v in trained_vars.items()
                  if k != "quant_stats"}
    _, mut = jax.jit(
        lambda v, b: tr_q.model.apply(v, b, deterministic=True,
                                      mutable=["quant_stats"]),
    )(calib_vars, first)
    tr_q.params = dict(calib_vars, quant_stats=mut["quant_stats"])
    out_q = score(tr_q)

    qids = sorted(out_b["q2a"])
    agree = float(np.mean(
        [out_b["q2a"][q] == out_q["q2a"][q] for q in qids]))
    hg_agree = float(np.mean(
        [out_b["hg_q2a"][q] == out_q["hg_q2a"][q] for q in qids]))
    print(json.dumps({
        "ckpt": ckpt,
        "platform": jax.devices()[0].platform,
        "n_valid_questions": len(qids),
        "bf16": {k: v for k, v in out_b.items()
                 if k not in ("q2a", "hg_q2a")},
        "int8": {k: v for k, v in out_q.items()
                 if k not in ("q2a", "hg_q2a")},
        "acc_delta": out_q["acc"] - out_b["acc"],
        "hg_acc_delta": out_q["hg_acc"] - out_b["hg_acc"],
        "answer_agree": agree,
        "hg_answer_agree": hg_agree,
    }))


if __name__ == "__main__":
    ckpt = os.environ.get("QN_CKPT")
    if ckpt:
        main_trained(ckpt)
    else:
        main()
