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
    # train-time answer accuracy from the hg head argmax, the reference's
    # per-epoch train score (agqaHGQA.py:394-402) computed in-graph
    metrics["hg_train_acc"] = jnp.mean(
        (jnp.argmax(outputs["hg_logit"], axis=-1)
         == jnp.argmax(batch["target"], axis=-1)).astype(jnp.float32))

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


def connected_param_mask(params, cfg: Config):
    """True = the parameter receives gradient from the task's loss graph.

    torch optimizers SKIP parameters whose ``.grad is None`` — in the
    reference, modules that only feed the UNSUPERVISED ``logit`` head under
    HGQA training (the cross-modal x_layers and the LXRT pooler: the HG path
    consumes the PRE-cross-attention snapshots, ``agqa_model.py:215-218``,
    and the HGQA loss backprops nothing through ``logit``,
    ``agqaHGQA.py:344-378``) are never touched by ``BertAdam.step``
    (``optimization.py:131-132`` ``if p.grad is None: continue``): no
    update AND no decoupled weight decay.  A JAX ``value_and_grad`` gives
    those leaves structural ZEROS instead, and an unmasked BertAdam would
    weight-decay them every step — a real (if slow) trajectory divergence.

    This mask encodes the loss-graph connectivity per task so disconnected
    subtrees ride the same zero-update path as frozen ones.  Locked against
    torch by tests/test_reference_checkpoint_import.py (flagship dims) and
    tests/test_optimizer.py.
    """
    task = cfg.task
    per_choice = (task != "q"
                  and cfg.data.qa_arrange_type in ("add_sep", "no_sep"))

    def decide(path) -> bool:
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if task in ("hgqa", "vhga", "hgvqa"):
            if cfg.gt_hg:
                # GT-HG embeds ground-truth labels; the decoders and class
                # heads are built but bypassed (agqa_model.py:223-231)
                for dead in ("rel_decoder", "action_decoder",
                             "class_embed", "action_embed"):
                    if dead in keys:
                        return False
            if task in ("hgqa", "vhga") and not cfg.after_cross_attn_feats:
                # post-cross streams feed only `logit`: x_layers + pooler
                # are grad-disconnected (for 'hgvqa' the fusion head
                # supervises the pooled output, star_model.py:189-191)
                if "lxrt" in keys:
                    rest = keys[keys.index("lxrt") + 1:]
                    if rest and rest[0] == "pooler":
                        return False
                    if (len(rest) > 1 and rest[0] == "encoder"
                            and rest[1].startswith("x_")):
                        return False
            if per_choice:
                # per-choice heads score the hg path; logit_fc/logit_fc2
                # exist but are unused in this arrangement
                if "logit_fc" in keys or "logit_fc2" in keys:
                    return False
                if task == "hgvqa" and "choice_score_fc" in keys \
                        and "choice_score_fc2" not in keys:
                    return False   # plain-logit head, unsupervised
            elif task == "hgvqa" and "logit_fc" in keys \
                    and "logit_fc2" not in keys:
                return False       # logit unsupervised; fusion head learns
        elif task == "vqa" and per_choice and "logit_fc" in keys:
            return False           # choice head scores; logit_fc unused
        return True

    return jax.tree_util.tree_map_with_path(
        lambda path, _: decide(path), params)


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


def make_eval_step(cfg: Config, model, with_hg_metrics: bool = False):
    """Returns eval_step(params, batch) -> outputs dict with answer argmaxes.

    With ``with_hg_metrics`` and a batch carrying HG labels (valid split of
    an hg task), the Hungarian-matched rel/act class accuracy is computed
    IN the same forward — the reference computes class accuracy inside its
    predict pass (``agqaHGQA.py:548-559``), and a second full-split forward
    just for the metric doubled our per-epoch eval wall time (round-4
    verdict item 2).  Kept off for plain prediction passes: test-protocol
    items carry DUMMY zero label grids (data/agqa.py test_mode), and the
    in-graph matcher would burn cycles scoring garbage."""
    want_hg_acc = (with_hg_metrics
                   and cfg.task in ("hgqa", "vhga", "hgvqa")
                   and not cfg.gt_hg)

    def eval_step(params, batch):
        outputs = model.apply(params, batch, deterministic=True)
        preds = {"answer": jnp.argmax(outputs["logit"], axis=-1)}
        if "hg_logit" in outputs:
            preds["hg_answer"] = jnp.argmax(outputs["hg_logit"], axis=-1)
        if "rel_preds" in outputs:
            preds["rel_top1"] = jnp.argmax(outputs["rel_preds"], axis=-1)
            preds["act_top1"] = jnp.argmax(outputs["act_preds"], axis=-1)
        if want_hg_acc and "rel_preds" in outputs and "rel_labels" in batch:
            rel_w = empty_weight(cfg.num_rel_classes + 1, cfg.eos_coef)
            act_w = empty_weight(cfg.num_act_classes + 1, cfg.eos_coef)
            rel = hungarian_set_loss(
                outputs["rel_preds"], batch["rel_labels"],
                batch["rel_lengths"], rel_w,
                per_frame=cfg.loss_hg_per_frame,
                num_situations=cfg.data.num_situations)
            act = hungarian_set_loss(
                outputs["act_preds"], batch["act_labels"],
                batch["act_lengths"], act_w,
                per_frame=cfg.loss_hg_per_frame,
                num_situations=cfg.data.num_situations)
            preds["rel_class_acc"] = 100.0 - rel["class_error"]
            preds["act_class_acc"] = 100.0 - act["class_error"]
        return preds

    return eval_step
