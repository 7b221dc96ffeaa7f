"""Answer-head losses.

- BCE: ``nn.BCEWithLogitsLoss()(logit, one_hot) * num_answers``
  (``agqaHGQA.py:344-346``) — the elementwise mean scaled by the answer-space
  size, i.e. the per-example SUM over answers.
- MCE: ``nn.CrossEntropyLoss(ignore_index=-1)`` on answer indices
  (``agqaHGQA.py:151``, used with --mceLoss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_vqa_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """logits (B, A), targets (B, A) in {0,1}.  Mean BCE * A."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # numerically stable sigmoid BCE
    per_elem = (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.mean(per_elem) * logits.shape[-1]


def mce_vqa_loss(logits: jnp.ndarray, answer_idx: jnp.ndarray) -> jnp.ndarray:
    """logits (B, A), answer_idx (B,) with -1 = ignore."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = answer_idx >= 0
    idx = jnp.maximum(answer_idx, 0)
    nll = -jnp.take_along_axis(logp, idx[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
