"""Loss parity vs torch semantics (torch CPU is available in the image)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shgvqa_tpu.losses import (
    bce_vqa_loss,
    hungarian_set_loss,
    mce_vqa_loss,
    weighted_cross_entropy,
)
from shgvqa_tpu.losses.set_prediction import empty_weight


def test_weighted_ce_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    logits = rng.randn(4, 7, 6).astype(np.float32)
    targets = rng.randint(0, 6, (4, 7))
    w = empty_weight(6, 0.1)
    ours = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), w))
    ref = float(F.cross_entropy(
        torch.tensor(logits).transpose(1, 2),
        torch.tensor(targets),
        torch.tensor(np.asarray(w)),
    ))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_bce_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    logits = rng.randn(3, 13).astype(np.float32)
    tgt = np.zeros((3, 13), np.float32)
    tgt[np.arange(3), [2, 5, 0]] = 1.0
    ours = float(bce_vqa_loss(jnp.asarray(logits), jnp.asarray(tgt)))
    ref = float(
        torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(tgt))
        * 13
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_mce_matches_torch_with_ignore():
    import torch

    rng = np.random.RandomState(2)
    logits = rng.randn(5, 4).astype(np.float32)
    idx = np.array([0, 3, -1, 2, 1])
    ours = float(mce_vqa_loss(jnp.asarray(logits), jnp.asarray(idx)))
    ref = float(torch.nn.CrossEntropyLoss(ignore_index=-1)(
        torch.tensor(logits), torch.tensor(idx)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_hungarian_set_loss_runs_both_modes():
    rng = np.random.RandomState(3)
    b, s, r, c = 2, 4, 3, 8
    logits = jnp.asarray(rng.randn(b, s * r, c), jnp.float32)
    labels_pf = jnp.asarray(rng.randint(1, c, (b, s, r)), jnp.int32)
    lengths_pf = jnp.asarray(rng.randint(1, r + 1, (b, s)), jnp.int32)
    w = empty_weight(c, 0.1)
    out = hungarian_set_loss(logits, labels_pf, lengths_pf, w,
                             per_frame=True, num_situations=s)
    assert np.isfinite(float(out["loss_ce"]))
    assert 0.0 <= float(out["class_error"]) <= 100.0

    labels_g = jnp.asarray(rng.randint(1, c, (b, s * r)), jnp.int32)
    lengths_g = jnp.asarray([5, 12], jnp.int32)
    out_g = hungarian_set_loss(logits, labels_g, lengths_g, w,
                               per_frame=False, num_situations=s)
    assert np.isfinite(float(out_g["loss_ce"]))


def test_set_loss_perfect_predictions_low_loss():
    """Logits that put all mass on the right labels should yield ~0 loss and
    0 class error."""
    b, s, r, c = 1, 2, 3, 6
    labels = np.array([[[1, 2, 0], [3, 0, 0]]], np.int32)
    lengths = np.array([[2, 1]], np.int32)
    logits = np.full((b, s, r, c), -20.0, np.float32)
    # queries 0,1 of frame 0 predict classes 1,2; query 0 of frame 1 -> 3
    logits[0, 0, 0, 1] = 20.0
    logits[0, 0, 1, 2] = 20.0
    logits[0, 0, 2, 0] = 20.0   # unmatched -> background
    logits[0, 1, 0, 3] = 20.0
    logits[0, 1, 1, 0] = 20.0
    logits[0, 1, 2, 0] = 20.0
    w = empty_weight(c, 0.1)
    out = hungarian_set_loss(
        jnp.asarray(logits.reshape(b, s * r, c)), jnp.asarray(labels),
        jnp.asarray(lengths), w, per_frame=True, num_situations=s)
    assert float(out["loss_ce"]) < 1e-3
    assert float(out["class_error"]) == pytest.approx(0.0)
