"""Model-level coverage of the --crossAttnType variants and capsule path."""

import dataclasses

import numpy as np
import jax
import pytest

from shgvqa_tpu.configs.config import tiny_test_config
from shgvqa_tpu.models.shgvqa import ShgVqaModel


def _vqa_batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    d, e = cfg.data, cfg.encoder
    t_in = e.visual_t + 8 if e.no_caps else e.visual_t
    return {
        "input_ids": rng.randint(
            1, e.vocab_size, (b, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((b, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((b, d.max_seq_length), np.int32),
        "visual_feats": rng.randn(
            b, t_in, e.visual_hw, e.visual_hw, e.visual_feat_dim
        ).astype(np.float32),
        "visual_mask": np.ones((b, e.visual_seq_length), np.int32)
        if e.no_caps else
        np.ones((b, 1 + e.visual_t * e.visual_hw ** 2), np.int32),
    }


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["self", "cross_self", "old"])
def test_cross_variant_forward(variant):
    base = tiny_test_config()
    enc = dataclasses.replace(base.encoder, cross_attn_type=variant)
    cfg = tiny_test_config(task="vqa", encoder=enc)
    model = ShgVqaModel(cfg)
    batch = _vqa_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True)
    assert out["logit"].shape == (2, cfg.num_answers)
    assert np.isfinite(np.asarray(out["logit"])).all()


@pytest.mark.slow
def test_capsule_path_hgqa():
    base = tiny_test_config()
    enc = dataclasses.replace(base.encoder, no_caps=False, num_prim_caps=4,
                              num_vis_caps=3, pose_dim=2,
                              caps_mask_features=True)
    cfg = tiny_test_config(task="hgqa", encoder=enc)
    model = ShgVqaModel(cfg)
    batch = _vqa_batch(cfg)
    d = cfg.data
    batch["hg_mask"] = np.ones(
        (2, d.num_situations, d.num_act + d.num_rel), np.int32)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True)
    assert out["hg_logit"].shape == (2, cfg.num_answers)
    assert np.isfinite(np.asarray(out["hg_logit"])).all()
