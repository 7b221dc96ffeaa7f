"""scan_layers=True must compute the SAME function as the unrolled stacks
(given params transplanted into the stacked layout)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgvqa_tpu.configs.config import tiny_test_config
from shgvqa_tpu.models.shgvqa import ShgVqaModel


def _batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    d, e = cfg.data, cfg.encoder
    t_in = e.visual_t + 8
    return {
        "input_ids": rng.randint(
            1, e.vocab_size, (b, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((b, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((b, d.max_seq_length), np.int32),
        "visual_feats": rng.randn(
            b, t_in, e.visual_hw, e.visual_hw, e.visual_feat_dim
        ).astype(np.float32),
        "visual_mask": np.ones((b, e.visual_seq_length), np.int32),
    }


def _stack_layers(per_layer_trees):
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *per_layer_trees)


@pytest.mark.slow
def test_scan_matches_unrolled_hgqa():
    base = tiny_test_config()
    cfg_u = tiny_test_config(task="hgqa")
    enc_s = dataclasses.replace(base.encoder, scan_layers=True)
    cfg_s = tiny_test_config(task="hgqa", encoder=enc_s)

    batch = _batch(cfg_u)
    model_u = ShgVqaModel(cfg_u)
    model_s = ShgVqaModel(cfg_s)
    params_u = model_u.init(jax.random.PRNGKey(0), batch, deterministic=True)
    params_s = jax.device_get(
        model_s.init(jax.random.PRNGKey(1), batch, deterministic=True))

    pu = jax.device_get(params_u)["params"]
    ps = params_s["params"]

    enc_u = pu["lxrt"]["encoder"]
    enc_s_p = ps["lxrt"]["encoder"]
    c = cfg_u.encoder
    # transplant: l_0..l_{n-1} -> l_stack (stacked), same for r; tied x layer
    # params broadcast into x_stack
    enc_s_p["l_stack"]["layers"]["BertLayer_0"] = _stack_layers(
        [enc_u[f"l_{i}"] for i in range(c.l_layers)])
    enc_s_p["r_stack"]["layers"]["BertLayer_0"] = _stack_layers(
        [enc_u[f"r_{i}"] for i in range(c.r_layers)])
    enc_s_p["x_stack"]["x_tied"]["CrossLayer_0"] = enc_u["x_tied"]
    enc_s_p["visual_tokenizer"] = enc_u["visual_tokenizer"]
    ps["lxrt"]["embeddings"] = pu["lxrt"]["embeddings"]
    ps["lxrt"]["pooler"] = pu["lxrt"]["pooler"]

    for dec in ("rel_decoder", "action_decoder"):
        ps[dec]["layers"]["DecoderLayer_0"] = _stack_layers(
            [pu[dec][f"layer_{i}"] for i in range(cfg_u.decoder.num_layers)])
    ps["hgq_encoder"]["x_stack"]["x_tied"]["CrossLayer_0"] = \
        pu["hgq_encoder"]["x_tied"]
    ps["hgq_encoder"]["pooler"] = pu["hgq_encoder"]["pooler"]
    for k in ("relation_query_embed", "action_query_embed", "class_embed",
              "action_embed", "logit_fc"):
        ps[k] = pu[k]
    # act/rel/cls type tokens of the hgq encoder
    for k in ("act_token", "rel_token", "cls_token"):
        ps["hgq_encoder"][k] = pu["hgq_encoder"][k]

    ps = jax.tree_util.tree_map(jnp.asarray, ps)
    out_u = model_u.apply(params_u, batch, deterministic=True)
    out_s = model_s.apply({"params": ps}, batch, deterministic=True)
    for k in ("logit", "hg_logit", "rel_preds", "act_preds"):
        np.testing.assert_allclose(
            np.asarray(out_u[k]), np.asarray(out_s[k]),
            rtol=2e-4, atol=2e-4, err_msg=k)
