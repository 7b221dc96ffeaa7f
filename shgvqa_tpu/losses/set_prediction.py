"""Set-prediction (Hungarian-matched) classification loss.

Rebuild of the reference's ``loss_labels``/``get_target_classes``
(``agqaHGQA.py:166-229``, duplicated in every driver) on top of the on-device
matcher:

- matched queries get their target class, all others the background index 0;
- weighted cross entropy with ``empty_weight``: all ones except
  ``eos_coef`` (0.1) on the background class (``agqaHGQA.py:103-112``);
- torch ``F.cross_entropy(weight=w)`` normalizes by the SUM OF WEIGHTS of the
  selected targets, not the element count — preserved here (that is a ~5x
  effective upweighting of matched slots versus a naive mean);
- ``class_error`` = 100 - top-1 accuracy over MATCHED slots only
  (``vis_utils.accuracy:388-403``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from shgvqa_tpu.ops.matcher import (
    match_targets_global,
    match_targets_per_frame,
)


def empty_weight(num_classes_with_bg: int, eos_coef: float,
                 background_idx: int = 0) -> jnp.ndarray:
    w = jnp.ones((num_classes_with_bg,), jnp.float32)
    return w.at[background_idx].set(eos_coef)


def weighted_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                           class_weights: jnp.ndarray) -> jnp.ndarray:
    """torch F.cross_entropy(weight=...) semantics:
    sum_i w[y_i] * nll_i / sum_i w[y_i].  logits (..., C), targets (...)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = class_weights[targets]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def matched_top1_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                          matched: jnp.ndarray) -> jnp.ndarray:
    """Top-1 accuracy (in %) over matched slots, 0 if none matched."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == targets) & matched
    n = jnp.sum(matched)
    return jnp.where(
        n > 0, 100.0 * jnp.sum(correct) / jnp.maximum(n, 1), 0.0
    )


def matched_target_grid(
    logits: jnp.ndarray,        # (B, Q, C) decoder class logits
    labels: jnp.ndarray,        # per-frame: (B, S, K); global: (B, S, K)|(B, N)
    lengths: jnp.ndarray,       # per-frame: (B, S); global: (B, S)|(B,)
    per_frame: bool,
    num_situations: int,
    background_idx: int = 0,
) -> jnp.ndarray:
    """The reference's ``get_target_classes`` grid (``agqaHGQA.py:178-201``):
    matched queries carry their Hungarian-assigned target class, everything
    else the background index.  Returned as (B, num_situations, Q/S) — the
    ``rel_lbls.view(b, 16, -1)`` layout the attention dumps serialize
    (``agqaHGQA.py:576-577``, ``star.py:502-503``)."""
    b, q, c = logits.shape
    s = num_situations
    if per_frame:
        grid, _ = match_targets_per_frame(
            logits.reshape(b, s, q // s, c), labels, lengths,
            background_idx=background_idx)
    else:
        if labels.ndim == 3:
            bsz, si, k = labels.shape
            valid = (jnp.arange(k)[None, None, :]
                     < lengths[:, :, None]).reshape(bsz, si * k)
            flat = labels.reshape(bsz, si * k)
            order = jnp.argsort(~valid, axis=-1, stable=True)
            labels = jnp.take_along_axis(flat, order, axis=-1)
            lengths = valid.sum(axis=-1).astype(lengths.dtype)
        grid, _ = match_targets_global(
            logits, labels, lengths, background_idx=background_idx)
    return grid.reshape(b, s, -1)


def hungarian_set_loss(
    logits: jnp.ndarray,        # (B, Q, C) decoder class logits
    labels: jnp.ndarray,        # per-frame: (B, S, K); global: (B, N)
    lengths: jnp.ndarray,       # per-frame: (B, S); global: (B,)
    class_weights: jnp.ndarray,  # (C,)
    per_frame: bool,
    num_situations: int,
    background_idx: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Returns {'loss_ce', 'class_error'} like the reference loss dict."""
    b, q, c = logits.shape
    if per_frame:
        s = num_situations
        logits_f = logits.reshape(b, s, q // s, c)
        target_classes, matched = match_targets_per_frame(
            logits_f, labels, lengths, background_idx=background_idx
        )
        loss = weighted_cross_entropy(logits_f, target_classes, class_weights)
        acc = matched_top1_accuracy(logits_f, target_classes, matched)
    else:
        if labels.ndim == 3:
            # driver layout: (B, S, K) per-situation padded labels with
            # (B, S) lengths.  Whole-clip matching (matcher.py:100-103
            # concatenates all clip targets): compact valid labels to a
            # prefix so the fixed-shape solver sees the first `total`
            # columns as real.
            bsz, s, k = labels.shape
            valid = (jnp.arange(k)[None, None, :]
                     < lengths[:, :, None]).reshape(bsz, s * k)
            flat = labels.reshape(bsz, s * k)
            order = jnp.argsort(~valid, axis=-1, stable=True)
            labels = jnp.take_along_axis(flat, order, axis=-1)
            lengths = valid.sum(axis=-1).astype(lengths.dtype)
        target_classes, matched = match_targets_global(
            logits, labels, lengths, background_idx=background_idx
        )
        loss = weighted_cross_entropy(logits, target_classes, class_weights)
        acc = matched_top1_accuracy(logits, target_classes, matched)
    return {"loss_ce": loss, "class_error": 100.0 - acc}
