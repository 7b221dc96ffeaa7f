"""Per-choice QA arrangement (--qaArrangeType add_sep / no_sep).

The reference formats qa0..qa3 as separate strings (star_data.py:184-196)
and threads them through the batch tuple (star.py:212-213) but never wires
them into the model ('we will add choices later').  Our build completes the
path: each (question, choice) pair gets its OWN encoding, the language side
of the tri-stream encoder and the HG cross encoder run per choice, and a
scalar score head yields (B, 4) logits -- drop-in compatible with STAR's
4-way answer target.
"""

import dataclasses

import numpy as np
import pytest

from shgvqa_tpu.configs.config import tiny_test_config


def _star_source(qa_type, task="hgqa"):
    from shgvqa_tpu.data.star import STARData, STARItemSource
    from shgvqa_tpu.data.tokenization import (
        BertTokenizer,
        build_vocab_from_corpus,
    )
    import tempfile, os

    cfg = tiny_test_config(task=task)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, qa_arrange_type=qa_type, qtype="Interaction"))
    data = STARData.synthetic(cfg, "train", n=24, seed=0)
    corpus = [x["question"] for x in data.datums]
    for x in data.datums:
        corpus += [c["choice"] if isinstance(c, dict) else str(c)
                   for c in x["choices"]] if isinstance(x["choices"], list) \
            else list(x["choices"].values())
    path = os.path.join(tempfile.mkdtemp(), "vocab.txt")
    build_vocab_from_corpus(corpus + ["0 1 2 3 :"], path)
    tok = BertTokenizer(path)
    src = STARItemSource(data, tok, cfg)
    return cfg, src


@pytest.mark.parametrize("qa_type", ["add_sep", "no_sep"])
def test_item_carries_four_distinct_encodings(qa_type):
    cfg, src = _star_source(qa_type)
    item = src[0]
    L = cfg.data.max_seq_length
    assert item["choice_input_ids"].shape == (4, L)
    assert item["choice_input_mask"].shape == (4, L)
    rows = [tuple(r) for r in item["choice_input_ids"]]
    assert len(set(rows)) == 4  # four DISTINCT encodings
    # every row is [CLS] ... [SEP]-terminated and shares the question prefix
    q_ids = item["input_ids"]
    q_len = int(item["input_mask"].sum()) - 1  # [CLS] + question tokens
    for r in item["choice_input_ids"]:
        assert tuple(r[:q_len]) == tuple(q_ids[:q_len])


def test_all_mode_has_no_choice_keys():
    _, src = _star_source("add_sep_all")
    assert "choice_input_ids" not in src[0]


def test_per_choice_model_forward_and_loss():
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.data.pipeline import stack_items
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.step import compute_losses

    cfg, src = _star_source("add_sep", task="hgqa")
    items = [src[i] for i in range(4)]
    e = cfg.encoder
    rng = np.random.RandomState(0)
    t_in = e.visual_t + 8
    for it in items:
        it.pop("ques_id", None)
        it["visual_feats"] = rng.randn(
            t_in, e.visual_hw, e.visual_hw, e.visual_feat_dim
        ).astype(np.float32)
    batch = stack_items(items)
    model = ShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True)

    assert out["logit"].shape == (4, 4)
    assert out["hg_logit"].shape == (4, 4)
    # choices genuinely differ: scores across the choice axis are not equal
    assert float(jnp.std(out["hg_logit"], axis=1).min()) > 0

    _, metrics = compute_losses(cfg, out, batch)
    assert np.isfinite(float(metrics["total_loss"]))

    # gradient flows into the per-choice score head
    def loss_fn(p):
        o = model.apply(p, batch, deterministic=True)
        return compute_losses(cfg, o, batch)[0]

    grads = jax.grad(loss_fn)(params)
    g = jax.tree_util.tree_leaves(grads["params"]["choice_score_fc"])
    assert any(float(jnp.abs(x).max()) > 0 for x in g)


def test_per_choice_hgvqa_fusion_head():
    import jax

    from shgvqa_tpu.data.pipeline import stack_items
    from shgvqa_tpu.models.shgvqa import ShgVqaModel

    cfg, src = _star_source("no_sep", task="hgvqa")
    items = [src[i] for i in range(2)]
    e = cfg.encoder
    rng = np.random.RandomState(0)
    for it in items:
        it.pop("ques_id", None)
        it["visual_feats"] = rng.randn(
            e.visual_t + 8, e.visual_hw, e.visual_hw, e.visual_feat_dim
        ).astype(np.float32)
    batch = stack_items(items)
    model = ShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True)
    assert out["hg_logit"].shape == (2, 4)
    assert "choice_score_fc2" in params["params"]
