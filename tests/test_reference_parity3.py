"""HGQ CrossEncoder parity vs the reference CrossEncoder
(modeling_capsbert.py:1075-1215) with transplanted weights."""

import os

import numpy as np
import pytest

REF = "/root/reference/AGQA"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")


def test_hgq_cross_encoder_exact_vs_reference():
    import jax
    import jax.numpy as jnp

    from tests.test_reference_parity2 import _load_ref
    from tests.test_reference_parity_full import _cross_layer, _dense
    from shgvqa_tpu.configs.config import EncoderConfig
    from shgvqa_tpu.models.hg import HGQCrossEncoder

    torch, mc = _load_ref()
    X = 2
    mc.VISUAL_CONFIG.x_layers = X

    D, HEADS, FFN = 24, 4, 48
    NUM_ACT, NUM_REL, S = 2, 3, 4
    config = mc.BertConfig(
        vocab_size_or_config_json_file=60,
        hidden_size=D,
        num_attention_heads=HEADS,
        intermediate_size=FFN,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    ref = mc.CrossEncoder(config, cross_attn_type="cross",
                          num_max_act=NUM_ACT, num_max_rel=NUM_REL)
    ref.eval()

    rng = np.random.RandomState(11)
    b, lt = 2, 7
    hg_len = S * (NUM_ACT + NUM_REL)
    lang = rng.randn(b, lt, D).astype(np.float32)
    hg = rng.randn(b, hg_len, D).astype(np.float32)
    lang01 = np.ones((b, lt), np.float32)
    lang01[1, 5:] = 0
    lang_ext = ((1.0 - lang01) * -10000.0)[:, None, None, :].astype(
        np.float32)
    hg01 = rng.randint(0, 2, (b, S, NUM_ACT + NUM_REL)).astype(np.float32)

    with torch.no_grad():
        ref_pooled, _ = ref(
            torch.tensor(lang), torch.tensor(lang_ext),
            torch.tensor(hg), torch.tensor(hg01),
        )
    ref_pooled = ref_pooled.numpy()

    enc_cfg = EncoderConfig(
        hidden_size=D, num_heads=HEADS, intermediate_size=FFN,
        hidden_dropout=0.0, attention_dropout=0.0,
        x_layers=X, cross_attn_type="cross", tie_x_layers=True,
    )
    ours = HGQCrossEncoder(enc_cfg, num_max_act=NUM_ACT, num_max_rel=NUM_REL)
    params = jax.device_get(ours.init(
        jax.random.PRNGKey(0), jnp.asarray(lang), jnp.asarray(lang_ext),
        jnp.asarray(hg), jnp.asarray(hg01.astype(np.int32))))
    pp = params["params"]
    sd = {k: np.asarray(v) for k, v in ref.state_dict().items()}
    # the reference instantiates ALL four variants in a ModuleDict and ties
    # x_layers to the selected one; 'cross' weights live under
    # cross_attn_layer.cross.*
    pp["x_tied"] = _cross_layer(sd, "cross_attn_layer.cross")
    pp["act_token"] = sd["act_token"]
    pp["rel_token"] = sd["rel_token"]
    pp["cls_token"] = sd["cls_token"]
    pp["pooler"] = {"dense2": _dense(sd, "pooler_dict.cross.dense2")}

    pp = jax.tree_util.tree_map(jnp.asarray, pp)
    pooled = ours.apply(
        {"params": pp}, jnp.asarray(lang), jnp.asarray(lang_ext),
        jnp.asarray(hg), jnp.asarray(hg01.astype(np.int32)),
        True)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=3e-4, atol=3e-4)
