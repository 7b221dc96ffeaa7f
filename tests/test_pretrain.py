import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgvqa_tpu.models.pretrain import (
    AnswerTable,
    PretrainingHeads,
    cosine_contrastive_loss,
    mask_visual_feats,
    mask_words,
    masked_lm_loss,
    matched_loss,
    visual_feat_loss,
)


def test_pretraining_heads_shapes():
    heads = PretrainingHeads(num_answers=7)
    lang = jnp.zeros((2, 5, 16))
    pooled = jnp.zeros((2, 16))
    table = jnp.zeros((30, 16))
    params = heads.init(jax.random.PRNGKey(0), lang, pooled, table)
    out = heads.apply(params, lang, pooled, table)
    assert out["lm_logits"].shape == (2, 5, 30)
    assert out["matched_logits"].shape == (2, 2)
    assert out["qa_logits"].shape == (2, 7)


def test_masked_lm_loss_ignores_unmasked():
    logits = jnp.zeros((1, 3, 5))
    labels = jnp.asarray([[-1, 2, -1]])
    loss = float(masked_lm_loss(logits, labels))
    assert loss == pytest.approx(np.log(5), rel=1e-5)


def test_matched_loss_perfect():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    labels = jnp.asarray([0, 1])
    assert float(matched_loss(logits, labels)) < 1e-6


def test_cosine_contrastive_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    a = rng.randn(4, 8).astype(np.float32)
    b = rng.randn(4, 8).astype(np.float32)
    t = np.asarray([1, -1, 1, -1], np.float32)
    ours = float(cosine_contrastive_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(t), margin=0.1))
    ref = float(torch.nn.CosineEmbeddingLoss(margin=0.1)(
        torch.tensor(a), torch.tensor(b), torch.tensor(t)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_mask_words_statistics():
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 100, (64, 20)).astype(np.int32)
    mask = np.ones_like(ids)
    masked, labels = mask_words(ids, mask, vocab_size=100, mask_token_id=4,
                                rate=0.15, rng=np.random.RandomState(1))
    picked = labels >= 0
    assert 0.10 < picked.mean() < 0.20
    # CLS position never masked
    assert (labels[:, 0] == -1).all()
    # ~80% of picked become [MASK]
    frac_mask = (masked[picked] == 4).mean()
    assert 0.6 < frac_mask < 0.95
    # unmasked positions unchanged
    np.testing.assert_array_equal(masked[~picked], ids[~picked])


def test_mask_visual_feats():
    feats = np.ones((4, 10, 8), np.float32)
    masked, m = mask_visual_feats(feats, rate=0.5,
                                  rng=np.random.RandomState(0))
    assert masked[m].sum() == 0
    assert (masked[~m] == 1).all()
    loss = float(visual_feat_loss(jnp.zeros((4, 10, 8)),
                                  jnp.asarray(feats), jnp.asarray(m)))
    assert loss == pytest.approx(1.0)


def test_answer_table_normalization():
    t = AnswerTable(["The dog", "dog", "a cat.", "CAT", "bird"])
    assert len(t) == 3
    assert t.convert("dog") == t.convert("the dog")
    assert t.convert("cat") == t.convert("A cat.")
    assert t.convert("unknown thing") == -1


def test_vocab_helpers(tmp_path):
    from shgvqa_tpu.data.vocab import (
        create_relationship_data,
        get_act_cls,
        get_action_dictionaries,
    )

    (tmp_path / "action_classes.txt").write_text(
        "c001 someone is cooking\nc002 someone is running\n")
    acts = get_act_cls(str(tmp_path))
    assert acts == {"c001": "someone is cooking",
                    "c002": "someone is running"}
    d = get_action_dictionaries(acts)
    assert d["actions_rp2idx"]["c001"] == 1  # labels start at 1

    datums = [{
        "situations": {
            "000001": {"rel_pairs": [["person", "cup"]],
                       "rel_labels": ["holding"]},
            "000002": {"rel_pairs": [["person", "cup"], ["person", "door"]],
                       "rel_labels": ["holding", "opening"]},
        }
    }]
    rels = create_relationship_data(datums)
    assert rels["rel_triplets_rp2idx"][("person", "holding", "cup")] == 1
    assert len(rels["rel_triplets"]) == 2
