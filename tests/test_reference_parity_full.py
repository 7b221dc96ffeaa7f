"""FULL encoder-stack parity: our LXRTModel vs the reference NoCapsModel
(embeddings + visual tokenizer + l/r/x layers + pooler) with every weight
transplanted.  This is the end-to-end numerical contract for the published
'cross' configuration (minus the torch.hub backbone, which takes features)."""

import os

import numpy as np
import pytest

REF = "/root/reference/AGQA"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")


def _dense(sd, prefix):
    return {"Dense_0": {"kernel": sd[prefix + ".weight"].T,
                        "bias": sd[prefix + ".bias"]}}


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _bert_layer(sd, prefix):
    return {
        "attention": {
            "self": {
                "query": _dense(sd, f"{prefix}.attention.self.query"),
                "key": _dense(sd, f"{prefix}.attention.self.key"),
                "value": _dense(sd, f"{prefix}.attention.self.value"),
            },
            "output": {
                "dense": _dense(sd, f"{prefix}.attention.output.dense"),
                "ln": _ln(sd, f"{prefix}.attention.output.LayerNorm"),
            },
        },
        "ffn": {
            "intermediate": _dense(sd, f"{prefix}.intermediate.dense"),
            "output": _dense(sd, f"{prefix}.output.dense"),
            "ln": _ln(sd, f"{prefix}.output.LayerNorm"),
        },
    }


def _cross_layer(sd, prefix):
    return {
        "visual_attention": {
            "att": {
                "query": _dense(sd, f"{prefix}.visual_attention.att.query"),
                "key": _dense(sd, f"{prefix}.visual_attention.att.key"),
                "value": _dense(sd, f"{prefix}.visual_attention.att.value"),
            },
            "output": {
                "dense": _dense(
                    sd, f"{prefix}.visual_attention.output.dense"),
                "ln": _ln(
                    sd, f"{prefix}.visual_attention.output.LayerNorm"),
            },
        },
        "lang_ffn": {
            "intermediate": _dense(sd, f"{prefix}.lang_inter.dense"),
            "output": _dense(sd, f"{prefix}.lang_output.dense"),
            "ln": _ln(sd, f"{prefix}.lang_output.LayerNorm"),
        },
        "visn_ffn": {
            "intermediate": _dense(sd, f"{prefix}.visn_inter.dense"),
            "output": _dense(sd, f"{prefix}.visn_output.dense"),
            "ln": _ln(sd, f"{prefix}.visn_output.LayerNorm"),
        },
    }


def test_full_lxrt_encoder_exact_vs_reference():
    import jax
    import jax.numpy as jnp

    from tests.test_reference_parity2 import _load_ref
    from shgvqa_tpu.configs.config import EncoderConfig
    from shgvqa_tpu.models.encoder import LXRTModel

    torch, mc = _load_ref()

    # small geometry via the module-global VisualConfig
    L, X, R = 2, 2, 2
    mc.VISUAL_CONFIG.l_layers = L
    mc.VISUAL_CONFIG.x_layers = X
    mc.VISUAL_CONFIG.r_layers = R
    mc.VISUAL_CONFIG.t = 2
    mc.VISUAL_CONFIG.hw = 3
    mc.VISUAL_CONFIG.max_spatial_pos_emb = 2 * 3 * 3
    mc.VISUAL_CONFIG.visual_feat_dim = 16

    D, HEADS, FFN = 24, 4, 48
    config = mc.BertConfig(
        vocab_size_or_config_json_file=60,
        hidden_size=D,
        num_attention_heads=HEADS,
        intermediate_size=FFN,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=32,
        type_vocab_size=2,
    )
    ref = mc.NoCapsModel(config, cross_attn_type="cross", no_caps=True)
    ref.encoder.visn_fc.conv[1] = torch.nn.Conv3d(16, D, (5, 3, 3))
    ref.encoder.visn_fc.conv[4] = torch.nn.Conv3d(D, D, (5, 3, 3))
    ref.eval()

    rng = np.random.RandomState(7)
    b, lt = 2, 9
    n_vis_tokens = 2 * 3 * 3 + 1
    ids = rng.randint(1, 60, (b, lt)).astype(np.int64)
    seg = np.zeros_like(ids)
    mask01 = np.ones((b, lt), np.int64)
    mask01[1, 6:] = 0
    feats_torch = rng.randn(b, 16, 10, 3, 3).astype(np.float32)
    boxes = np.ones((b, n_vis_tokens), np.float32)

    with torch.no_grad():
        (ref_lang, ref_visn), ref_pooled, _ = ref(
            torch.tensor(ids), torch.tensor(seg), torch.tensor(mask01),
            visual_feats=(torch.tensor(feats_torch), torch.tensor(boxes)),
        )
    ref_lang = ref_lang.numpy()
    ref_visn = ref_visn.numpy()
    ref_pooled = ref_pooled.numpy()

    enc_cfg = EncoderConfig(
        vocab_size=60, hidden_size=D, num_heads=HEADS,
        intermediate_size=FFN, hidden_dropout=0.0, attention_dropout=0.0,
        max_position_embeddings=32, type_vocab_size=2,
        l_layers=L, x_layers=X, r_layers=R, cross_attn_type="cross",
        tie_x_layers=True, visual_feat_dim=16, visual_t=2, visual_hw=3,
    )
    ours = LXRTModel(enc_cfg, "float32")
    feats_jax = jnp.asarray(feats_torch.transpose(0, 2, 3, 4, 1))
    params = jax.device_get(ours.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask01),
        jnp.asarray(seg), feats_jax, jnp.asarray(boxes.astype(np.int32))))

    sd = {k: np.asarray(v) for k, v in ref.state_dict().items()}
    pp = {}
    pp["embeddings"] = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]},
        "ln": _ln(sd, "embeddings.LayerNorm"),
    }
    enc = {}
    enc["visual_tokenizer"] = {
        "conv1": {"kernel": sd["encoder.visn_fc.conv.1.weight"].transpose(
            2, 3, 4, 1, 0), "bias": sd["encoder.visn_fc.conv.1.bias"]},
        "conv2": {"kernel": sd["encoder.visn_fc.conv.4.weight"].transpose(
            2, 3, 4, 1, 0), "bias": sd["encoder.visn_fc.conv.4.bias"]},
        "cls_token": sd["encoder.visn_fc.cls_token"],
        "pos_embedding": sd[
            "encoder.visn_fc.position_encoding.pe.weight"][:n_vis_tokens],
    }
    for i in range(L):
        enc[f"l_{i}"] = _bert_layer(sd, f"encoder.layer.{i}")
    for i in range(R):
        enc[f"r_{i}"] = _bert_layer(sd, f"encoder.r_layers.{i}")
    # weight-tied x layers: reference state_dict repeats the single instance
    # as x_layers.0 / x_layers.1 with identical tensors
    np.testing.assert_array_equal(
        sd["encoder.x_layers.0.visual_attention.att.query.weight"],
        sd["encoder.x_layers.1.visual_attention.att.query.weight"])
    enc["x_tied"] = _cross_layer(sd, "encoder.x_layers.0")
    pp["encoder"] = enc
    pp["pooler"] = {"dense2": _dense(sd, "pooler_dict.cross.dense2")}

    pp = jax.tree_util.tree_map(jnp.asarray, pp)
    pooled, lang, visn, _, _, _ = ours.apply(
        {"params": pp}, jnp.asarray(ids), jnp.asarray(mask01),
        jnp.asarray(seg), feats_jax, jnp.asarray(boxes.astype(np.int32)),
        True)

    np.testing.assert_allclose(np.asarray(lang), ref_lang,
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(visn), ref_visn,
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=3e-4, atol=3e-4)
