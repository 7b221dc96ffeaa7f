import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shgvqa_tpu.configs.config import tiny_test_config
from shgvqa_tpu.models.shgvqa import ShgVqaModel


def _batch(cfg, b=2, with_video=True, seed=0):
    rng = np.random.RandomState(seed)
    d = cfg.data
    e = cfg.encoder
    batch = {
        "input_ids": rng.randint(1, e.vocab_size, (b, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((b, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((b, d.max_seq_length), np.int32),
    }
    if with_video:
        # backbone features, channel-last: (B, T, H, W, C)
        t_in = e.visual_t + 8  # two valid kernel-5 convs: T' = T - 8
        batch["visual_feats"] = rng.randn(
            b, t_in, e.visual_hw, e.visual_hw, e.visual_feat_dim
        ).astype(np.float32)
        batch["visual_mask"] = np.ones((b, e.visual_seq_length), np.int32)
        batch["hg_mask"] = rng.randint(
            0, 2, (b, d.num_situations, d.num_act + d.num_rel)
        ).astype(np.int32)
    return batch


def _init_and_run(cfg, batch):
    model = ShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True)
    return params, out


def test_task_q_forward():
    cfg = tiny_test_config(task="q")
    batch = _batch(cfg, with_video=False)
    _, out = _init_and_run(cfg, batch)
    assert out["logit"].shape == (2, cfg.num_answers)
    assert np.isfinite(np.asarray(out["logit"])).all()


def test_task_vqa_forward():
    cfg = tiny_test_config(task="vqa")
    batch = _batch(cfg)
    _, out = _init_and_run(cfg, batch)
    assert out["logit"].shape == (2, cfg.num_answers)


def test_task_hgqa_forward_shapes():
    cfg = tiny_test_config(task="hgqa")
    batch = _batch(cfg)
    _, out = _init_and_run(cfg, batch)
    d = cfg.data
    assert out["logit"].shape == (2, cfg.num_answers)
    assert out["hg_logit"].shape == (2, cfg.num_answers)
    assert out["rel_preds"].shape == (2, d.num_rel_queries, cfg.num_rel_classes + 1)
    assert out["act_preds"].shape == (2, d.num_act_queries, cfg.num_act_classes + 1)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_task_hgvqa_has_fusion_head():
    cfg = tiny_test_config(task="hgvqa", use_hg_mask=True)
    batch = _batch(cfg)
    params, out = _init_and_run(cfg, batch)
    assert "logit_fc2" in params["params"]
    assert out["hg_logit"].shape == (2, cfg.num_answers)


def test_task_vhga_deaf_ignores_question():
    cfg = tiny_test_config(task="vhga")
    b1 = _batch(cfg)
    b2 = {k: v.copy() for k, v in b1.items()}
    b2["input_ids"] = np.roll(b1["input_ids"], 1, axis=1)  # different question
    model = ShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), b1, deterministic=True)
    out1 = model.apply(params, b1, deterministic=True)
    out2 = model.apply(params, b2, deterministic=True)
    # language is fully masked, but token embeddings still flow through the
    # value path of the joint/cross attention in the lang stream; the VISUAL
    # stream and hg decoding must be unaffected by the question content.
    np.testing.assert_allclose(
        np.asarray(out1["rel_preds"]), np.asarray(out2["rel_preds"]),
        rtol=2e-5, atol=2e-5,
    )


def test_tied_x_layers_share_params():
    cfg_tied = tiny_test_config(task="vqa")
    cfg_untied = tiny_test_config(
        task="vqa",
        encoder=tiny_test_config().encoder.__class__(
            **{**tiny_test_config().encoder.__dict__, "tie_x_layers": False}
        ),
    )
    batch = _batch(cfg_tied)
    p_tied, _ = _init_and_run(cfg_tied, batch)
    p_untied, _ = _init_and_run(cfg_untied, batch)
    n_tied = sum(x.size for x in jax.tree.leaves(p_tied))
    n_untied = sum(x.size for x in jax.tree.leaves(p_untied))
    assert n_untied > n_tied
    enc_tied = p_tied["params"]["lxrt"]["encoder"]
    assert "x_tied" in enc_tied and "x_1" not in enc_tied
    enc_untied = p_untied["params"]["lxrt"]["encoder"]
    assert "x_0" in enc_untied and "x_1" in enc_untied


def test_cross_layer_shares_attention_both_directions():
    cfg = tiny_test_config(task="vqa")
    batch = _batch(cfg)
    params, _ = _init_and_run(cfg, batch)
    xl = params["params"]["lxrt"]["encoder"]["x_tied"]
    # one shared cross-attention block, two FFNs
    assert "visual_attention" in xl
    assert "lang_ffn" in xl and "visn_ffn" in xl


def test_gt_hg_mode():
    cfg = tiny_test_config(task="hgqa", gt_hg=True)
    batch = _batch(cfg)
    d = cfg.data
    rng = np.random.RandomState(1)
    batch["rel_tgt_ids"] = rng.randint(
        0, cfg.num_rel_classes + 1, (2, d.num_rel_queries)).astype(np.int32)
    batch["act_tgt_ids"] = rng.randint(
        0, cfg.num_act_classes + 1, (2, d.num_act_queries)).astype(np.int32)
    _, out = _init_and_run(cfg, batch)
    assert "rel_preds" not in out
    assert out["hg_logit"].shape == (2, cfg.num_answers)


def test_padding_idx_row_gets_no_gradient():
    """torch padding_idx semantics: row 0 of the embedding tables receives
    ZERO gradient (frozen at its init value) while other rows train."""
    import jax.numpy as jnp

    cfg = tiny_test_config(task="q")
    batch = _batch(cfg, with_video=False)
    batch["input_ids"][:, 3] = 0  # ensure [PAD] id 0 is actually used
    model = ShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)

    def loss(p):
        out = model.apply(p, batch, deterministic=True)
        return jnp.sum(out["logit"] ** 2)

    grads = jax.grad(loss)(params)
    g = np.asarray(
        grads["params"]["bert_encoder"]["embeddings"]["word_embeddings"][
            "embedding"])
    assert np.abs(g[0]).max() == 0.0      # padding row frozen
    assert np.abs(g[1:]).max() > 0.0      # real rows train
    gp = np.asarray(
        grads["params"]["bert_encoder"]["embeddings"]["position_embeddings"][
            "embedding"])
    assert np.abs(gp[0]).max() == 0.0     # position 0 frozen too (quirk)


def test_situation_causality_in_decoder():
    """Perturbing a LATE situation's memory must not change EARLY situation
    rel predictions... memory is shared (all queries see all visual tokens),
    so instead verify causality at the query level: zeroing future QUERY
    embeddings cannot affect earlier situations' outputs."""
    cfg = tiny_test_config(task="hgqa")
    batch = _batch(cfg)
    model = ShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)

    out = model.apply(params, batch, deterministic=True)
    # mutate the LAST situation's rel query rows
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    tbl = p2["params"]["relation_query_embed"]["word_embeddings"]["embedding"]
    nrel = cfg.data.num_rel
    # NOTE: a constant shift across features would be removed by the
    # embeddings' LayerNorm; perturb a single feature column instead.
    p2["params"]["relation_query_embed"]["word_embeddings"]["embedding"] = (
        tbl.at[-nrel:, 0].add(7.0)
    )
    out2 = model.apply(p2, batch, deterministic=True)
    s = cfg.data.num_situations
    early = slice(0, (s - 1) * nrel)
    late = slice((s - 1) * nrel, s * nrel)
    a = np.asarray(out["rel_preds"])
    b_ = np.asarray(out2["rel_preds"])
    np.testing.assert_allclose(a[:, early], b_[:, early], rtol=2e-5, atol=2e-5)
    assert np.abs(a[:, late] - b_[:, late]).max() > 1e-3


@pytest.mark.slow
def test_video_model_attention_outputs():
    """--outputAttn must work through the frames->backbone wrapper too."""
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    cfg = tiny_test_config(task="hgqa")
    model = VideoShgVqaModel(cfg)
    rng = np.random.RandomState(0)
    d, e = cfg.data, cfg.encoder
    batch = {
        "input_ids": rng.randint(
            1, e.vocab_size, (1, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((1, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((1, d.max_seq_length), np.int32),
        # slow backbone preserves T; the conv tokenizer eats 8 frames
        "frames": rng.randint(0, 255, (1, e.visual_t + 8, 32, 32, 3)
                              ).astype(np.uint8),
    }
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True,
                      output_attentions=True)
    assert set(out["attentions"].keys()) == {"encoder", "hgq"}


def test_backbone_chunks_numerics_identical():
    """cfg.backbone_chunks is a pure peak-memory lever for the frozen trunk
    (sequential nn.scan micro-chunks, weights broadcast): the output must be
    bit-identical to the unchunked forward, and a non-divisible batch must
    fall back to the plain path."""
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    cfg = tiny_test_config(task="hgqa", freeze_backbone=True)
    rng = np.random.RandomState(0)
    d, e = cfg.data, cfg.encoder
    bsz = 4
    batch = {
        "input_ids": rng.randint(
            1, e.vocab_size, (bsz, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((bsz, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((bsz, d.max_seq_length), np.int32),
        "frames": rng.randint(0, 255, (bsz, e.visual_t + 8, 32, 32, 3)
                              ).astype(np.uint8),
    }
    model = VideoShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    base = model.apply(params, batch, deterministic=True)

    # not bit-equal: XLA tiles convolutions differently at batch 2 vs 4,
    # so accumulation order shifts — tight allclose instead
    chunked = VideoShgVqaModel(cfg.replace(backbone_chunks=2))
    out = chunked.apply(params, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(base["logit"]),
                               np.asarray(out["logit"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(base["rel_preds"]),
                               np.asarray(out["rel_preds"]),
                               rtol=2e-4, atol=2e-5)

    # non-divisible batch (4 % 3) silently uses the plain path: bit-equal
    fallback = VideoShgVqaModel(cfg.replace(backbone_chunks=3))
    out3 = fallback.apply(params, batch, deterministic=True)
    np.testing.assert_array_equal(np.asarray(base["logit"]),
                                  np.asarray(out3["logit"]))


def test_backbone_chunks_augmented_sampling_identical():
    """Chunked preprocessing must draw the SAME per-clip augment keys as the
    full-batch path: every augment op samples per clip, so chunk boundaries
    cannot change the result."""
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    cfg = tiny_test_config(task="hgqa", freeze_backbone=True)
    import dataclasses
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, augment_type="rand_aug"))
    rng = np.random.RandomState(0)
    d, e = cfg.data, cfg.encoder
    bsz = 4
    batch = {
        "input_ids": rng.randint(
            1, e.vocab_size, (bsz, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((bsz, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((bsz, d.max_seq_length), np.int32),
        "frames": rng.randint(0, 255, (bsz, e.visual_t + 8, 32, 32, 3)
                              ).astype(np.uint8),
    }
    model = VideoShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    rngs = {"dropout": jax.random.PRNGKey(7), "augment": jax.random.PRNGKey(3)}
    base = model.apply(params, batch, deterministic=False, rngs=rngs)
    chunked = VideoShgVqaModel(cfg.replace(backbone_chunks=2))
    out = chunked.apply(params, batch, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(base["logit"], np.float32),
                               np.asarray(out["logit"], np.float32),
                               rtol=2e-4, atol=2e-5)
