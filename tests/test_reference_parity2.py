"""More reference-parity tests: visual conv tokenizer and HG embeddings."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/AGQA"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")


def _load_ref():
    import types

    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("timm", "boto3", "requests"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "botocore" not in sys.modules:
        botocore = types.ModuleType("botocore")
        exceptions = types.ModuleType("botocore.exceptions")

        class ClientError(Exception):
            pass

        exceptions.ClientError = ClientError
        botocore.exceptions = exceptions
        sys.modules["botocore"] = botocore
        sys.modules["botocore.exceptions"] = exceptions
    import importlib

    return torch, importlib.import_module("src.lxrt.modeling_capsbert")


def test_visual_tokenizer_exact_vs_reference():
    """Conv3d x2 + CLS + learned pos-emb vs VisualFeatEncoder no-caps path
    (modeling_capsbert.py:989-1073), weights transplanted."""
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.models.visual import VisualTokenizer

    torch, mc = _load_ref()
    # shrink the geometry via the module-global VisualConfig
    mc.VISUAL_CONFIG.t = 2           # output temporal tokens
    mc.VISUAL_CONFIG.hw = 3
    mc.VISUAL_CONFIG.max_spatial_pos_emb = 2 * 3 * 3
    mc.VISUAL_CONFIG.visual_feat_dim = 16

    config = mc.BertConfig(
        vocab_size_or_config_json_file=100,
        hidden_size=24,
        num_attention_heads=4,
        intermediate_size=48,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    # reference conv expects 2048 in-channels hardcoded; monkeypatch by
    # rebuilding its conv for 16 channels (the hardcode is a quirk, our
    # parity target is the op sequence)
    ref = mc.VisualFeatEncoder(config, no_caps=True)
    ref.conv[1] = torch.nn.Conv3d(16, 24, kernel_size=(5, 3, 3))
    ref.conv[4] = torch.nn.Conv3d(24, 24, kernel_size=(5, 3, 3))
    ref.eval()

    rng = np.random.RandomState(0)
    b, t_in, hw, cdim = 2, 10, 3, 16
    feats_torch = rng.randn(b, cdim, t_in, hw, hw).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref((torch.tensor(feats_torch), None))
    ref_out = ref_out.detach().numpy()

    ours = VisualTokenizer(hidden_size=24, dropout=0.0)
    feats_jax = jnp.asarray(feats_torch.transpose(0, 2, 3, 4, 1))  # NDHWC
    params = jax.device_get(ours.init(jax.random.PRNGKey(0), feats_jax))
    pp = params["params"]
    sd = {k: np.asarray(v) for k, v in ref.state_dict().items()}
    # torch Conv3d weight (O, I, kT, kH, kW) -> flax (kT, kH, kW, I, O)
    pp["conv1"]["kernel"] = sd["conv.1.weight"].transpose(2, 3, 4, 1, 0)
    pp["conv1"]["bias"] = sd["conv.1.bias"]
    pp["conv2"]["kernel"] = sd["conv.4.weight"].transpose(2, 3, 4, 1, 0)
    pp["conv2"]["bias"] = sd["conv.4.bias"]
    pp["cls_token"] = sd["cls_token"]  # (1, 1, D)
    pp["pos_embedding"] = sd["position_encoding.pe.weight"][
        : 2 * hw * hw + 1]

    import jax.numpy as _jnp
    pp = jax.tree_util.tree_map(_jnp.asarray, pp)
    out = ours.apply({"params": pp}, feats_jax, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)


def test_hg_embeddings_exact_vs_reference():
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.models.hg import HGEmbeddings

    torch, mc = _load_ref()
    nq, tv, d = 12, 4, 16
    ref = mc.HGEmbeddings(num_queries=nq, type_vocab_size=tv, hidden_size=d,
                          hidden_dropout_prob=0.0)
    ref.eval()
    seg = np.repeat(np.arange(4), 3)[None].repeat(2, axis=0)  # (2, 12)
    with torch.no_grad():
        ref_out = ref(torch.tensor(seg))
    ref_out = ref_out.detach().numpy()

    ours = HGEmbeddings(num_queries=nq, hidden_size=d, type_vocab_size=tv,
                        dropout=0.0)
    params = jax.device_get(
        ours.init(jax.random.PRNGKey(0), jnp.asarray(seg)))
    pp = params["params"]
    sd = {k: np.asarray(v) for k, v in ref.state_dict().items()}
    pp["word_embeddings"]["embedding"] = sd["word_embeddings.weight"]
    pp["token_type_embeddings"]["embedding"] = sd[
        "token_type_embeddings.weight"]
    pp["ln"]["scale"] = sd["LayerNorm.weight"]
    pp["ln"]["bias"] = sd["LayerNorm.bias"]

    pp = jax.tree_util.tree_map(jnp.asarray, pp)
    out = ours.apply({"params": pp}, jnp.asarray(seg), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)


def test_bert_embeddings_exact_vs_reference():
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.models.layers import BertEmbeddings

    torch, mc = _load_ref()
    config = mc.BertConfig(
        vocab_size_or_config_json_file=50,
        hidden_size=16,
        num_attention_heads=4,
        intermediate_size=32,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=32,
        type_vocab_size=2,
    )
    ref = mc.BertEmbeddings(config)
    ref.eval()
    rng = np.random.RandomState(4)
    ids = rng.randint(0, 50, (2, 9)).astype(np.int64)
    seg = np.zeros_like(ids)
    with torch.no_grad():
        ref_out = ref(torch.tensor(ids), torch.tensor(seg)).numpy()

    ours = BertEmbeddings(vocab_size=50, hidden_size=16,
                          max_position_embeddings=32, type_vocab_size=2,
                          dropout=0.0)
    params = jax.device_get(ours.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(seg)))
    pp = params["params"]
    sd = {k: np.asarray(v) for k, v in ref.state_dict().items()}
    pp["word_embeddings"]["embedding"] = sd["word_embeddings.weight"]
    pp["position_embeddings"]["embedding"] = sd["position_embeddings.weight"]
    pp["token_type_embeddings"]["embedding"] = sd[
        "token_type_embeddings.weight"]
    pp["ln"]["scale"] = sd["LayerNorm.weight"]
    pp["ln"]["bias"] = sd["LayerNorm.bias"]
    pp = jax.tree_util.tree_map(jnp.asarray, pp)
    out = ours.apply({"params": pp}, jnp.asarray(ids), jnp.asarray(seg),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)
