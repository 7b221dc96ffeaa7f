"""Jitted train / eval steps.

One SPMD program per step (the reference's step is a Python orchestration of
featurization -> forward -> CPU Hungarian -> backward; here everything after
the input pipeline is a single XLA computation).

Loss composition per task matches the drivers:
- hgqa / vhga / hgvqa: bce(hg_logit, target) * num_answers  +  rel loss_ce +
  act loss_ce via Hungarian matching (``agqaHGQA.py:344-378``,
  ``star.py:305-344``).  The plain ``logit`` head gets NO loss (quirk
  preserved: it still trains indirectly through the shared logit_fc in the
  hg path).
- vqa / q: bce(logit, target) * num_answers, or mce with --mceLoss
  (``agqaVQA.py:251-260``).
- GT-HG mode drops the Hungarian losses (``agqaHGQA.py:349``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from shgvqa_tpu.configs.config import Config
from shgvqa_tpu.losses import bce_vqa_loss, hungarian_set_loss, mce_vqa_loss
from shgvqa_tpu.losses.set_prediction import empty_weight


def compute_losses(cfg: Config, outputs: Dict[str, jnp.ndarray],
                   batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
    metrics: Dict[str, jnp.ndarray] = {}
    task = cfg.task

    if task in ("q", "vqa"):
        if cfg.mce_loss:
            loss = mce_vqa_loss(outputs["logit"], batch["answer_idx"])
        else:
            loss = bce_vqa_loss(outputs["logit"], batch["target"])
        metrics["vqa_loss"] = loss
        metrics["total_loss"] = loss
        return loss, metrics

    hgqa_loss = bce_vqa_loss(outputs["hg_logit"], batch["target"])
    total = hgqa_loss
    metrics["hgqa_loss"] = hgqa_loss

    if not cfg.gt_hg:
        rel_w = empty_weight(cfg.num_rel_classes + 1, cfg.eos_coef)
        act_w = empty_weight(cfg.num_act_classes + 1, cfg.eos_coef)
        rel = hungarian_set_loss(
            outputs["rel_preds"], batch["rel_labels"], batch["rel_lengths"],
            rel_w, per_frame=cfg.loss_hg_per_frame,
            num_situations=cfg.data.num_situations,
        )
        act = hungarian_set_loss(
            outputs["act_preds"], batch["act_labels"], batch["act_lengths"],
            act_w, per_frame=cfg.loss_hg_per_frame,
            num_situations=cfg.data.num_situations,
        )
        total = total + rel["loss_ce"] + act["loss_ce"]
        metrics["rel_loss"] = rel["loss_ce"]
        metrics["act_loss"] = act["loss_ce"]
        metrics["rel_class_error"] = rel["class_error"]
        metrics["act_class_error"] = act["class_error"]

    metrics["total_loss"] = total
    return total, metrics


def make_train_step(cfg: Config, model, tx):
    """Returns train_step(params, opt_state, batch, rng) ->
    (params, opt_state, metrics)."""

    def loss_fn(params, batch, rng):
        r_drop, r_aug = jax.random.split(rng)
        outputs = model.apply(
            params, batch, deterministic=False,
            rngs={"dropout": r_drop, "augment": r_aug},
        )
        return compute_losses(cfg, outputs, batch)

    def train_step(params, opt_state, batch, rng):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def make_eval_step(cfg: Config, model):
    """Returns eval_step(params, batch) -> outputs dict with answer argmaxes."""

    def eval_step(params, batch):
        outputs = model.apply(params, batch, deterministic=True)
        preds = {"answer": jnp.argmax(outputs["logit"], axis=-1)}
        if "hg_logit" in outputs:
            preds["hg_answer"] = jnp.argmax(outputs["hg_logit"], axis=-1)
        if "rel_preds" in outputs:
            preds["rel_top1"] = jnp.argmax(outputs["rel_preds"], axis=-1)
            preds["act_top1"] = jnp.argmax(outputs["act_preds"], axis=-1)
        return preds

    return eval_step
