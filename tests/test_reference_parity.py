"""Numerical parity against the ACTUAL reference PyTorch modules.

These tests import the reference implementation from /root/reference at
runtime (read-only; nothing is copied), transplant weights into our flax
modules, and compare outputs.  They are skipped wherever the reference tree
is unavailable — the rest of the suite covers behavior with spec-derived
fixtures.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/AGQA"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    # stub the reference's unavailable deps (timm/boto3/requests are only
    # used on download paths we never exercise)
    for name in ("timm", "boto3", "requests"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.create_model = lambda *a, **k: None
            sys.modules[name] = stub
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

    transformer = importlib.import_module("src.lxrt.transformer")
    optimization = importlib.import_module("src.lxrt.optimization")
    matcher = importlib.import_module("src.lxrt.matcher")
    try:
        modeling = importlib.import_module("src.lxrt.modeling_capsbert")
    except Exception as e:  # noqa: BLE001
        modeling = None
        print(f"modeling_capsbert unimportable ({e}); related tests skip")
    return {
        "torch": torch,
        "transformer": transformer,
        "optimization": optimization,
        "matcher": matcher,
        "modeling": modeling,
    }


def _t2n(t):
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# BertAdam vs the reference optimizer, end-to-end over several steps
# ---------------------------------------------------------------------------

def test_bert_adam_exact_vs_reference(ref_modules):
    import jax.numpy as jnp
    import optax

    from shgvqa_tpu.train.optimizer import bert_adam

    torch = ref_modules["torch"]
    BertAdam = ref_modules["optimization"].BertAdam

    rng = np.random.RandomState(0)
    w0 = rng.randn(6).astype(np.float32)
    grads = [rng.randn(6).astype(np.float32) for _ in range(9)]

    # reference
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = BertAdam([p], lr=0.05, warmup=0.2, t_total=10)
    for g in grads:
        p.grad = torch.tensor(g)
        opt.step()
    ref_w = _t2n(p)

    # ours
    tx = bert_adam(0.05, t_total=10, warmup=0.2)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), ref_w,
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Hungarian matcher vs the reference scipy matcher (per-frame mode)
# ---------------------------------------------------------------------------

def test_matcher_exact_vs_reference_per_frame(ref_modules):
    import jax.numpy as jnp

    from shgvqa_tpu.ops.matcher import match_targets_per_frame

    torch = ref_modules["torch"]
    HungarianMatcher = ref_modules["matcher"].HungarianMatcher

    rng = np.random.RandomState(1)
    b, s, r, c = 2, 4, 3, 9
    logits = rng.randn(b, s * r, c).astype(np.float32)
    labels = rng.randint(1, c, (b, s, r)).astype(np.int64)
    lengths = rng.randint(1, r + 1, (b, s)).astype(np.int64)

    m = HungarianMatcher(cost_class=1, loss_hg_per_frame=True, clip_len=s)
    targets = []
    for bi in range(b):
        frame_labels = [
            torch.tensor(labels[bi, si, : lengths[bi, si]])
            for si in range(s)
        ]
        targets.append({"labels": frame_labels})
    indices = m({"pred_logits": torch.tensor(logits)}, targets)

    # reference scatter (agqaHGQA.get_target_classes semantics)
    ref_target = np.zeros((b * s, r), np.int64)
    flat_tgts = [t for sample in targets for t in sample["labels"]]
    for fi, (src_idx, tgt_idx) in enumerate(indices):
        ref_target[fi, _t2n(src_idx)] = _t2n(flat_tgts[fi][tgt_idx])
    ref_target = ref_target.reshape(b, s, r)

    ours, _ = match_targets_per_frame(
        jnp.asarray(logits.reshape(b, s, r, c)), jnp.asarray(labels),
        jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(ours), ref_target)


# ---------------------------------------------------------------------------
# DETR decoder layer vs reference TransformerDecoderLayer (weights
# transplanted torch -> flax)
# ---------------------------------------------------------------------------

def test_decoder_layer_exact_vs_reference(ref_modules):
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.models.decoder import DecoderLayer

    torch = ref_modules["torch"]
    TDL = ref_modules["transformer"].TransformerDecoderLayer

    d, heads, ffn = 32, 4, 64
    ref_layer = TDL(d_model=d, nhead=heads, dim_feedforward=ffn, dropout=0.0)
    ref_layer.eval()

    rng = np.random.RandomState(2)
    q_len, m_len, b = 6, 10, 2
    tgt = rng.randn(q_len, b, d).astype(np.float32)      # torch: (L, B, D)
    memory = rng.randn(m_len, b, d).astype(np.float32)
    query_pos = rng.randn(q_len, b, d).astype(np.float32)
    tgt_mask = np.triu(np.full((q_len, q_len), float("-inf")), k=1).astype(
        np.float32)

    with torch.no_grad():
        ref_out = ref_layer(
            torch.tensor(tgt), torch.tensor(memory),
            tgt_mask=torch.tensor(tgt_mask),
            query_pos=torch.tensor(query_pos),
        )
    ref_out = _t2n(ref_out).transpose(1, 0, 2)           # -> (B, L, D)

    ours = DecoderLayer(num_heads=heads, ffn_dim=ffn, dropout=0.0)
    batch_tgt = jnp.asarray(tgt.transpose(1, 0, 2))
    batch_mem = jnp.asarray(memory.transpose(1, 0, 2))
    batch_qpos = jnp.asarray(query_pos.transpose(1, 0, 2))
    params = ours.init(jax.random.PRNGKey(0), batch_tgt, batch_mem,
                       batch_qpos, jnp.asarray(tgt_mask))

    sd = ref_layer.state_dict()

    def put(tree, path, val):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = jnp.asarray(val)

    p = jax.tree_util.tree_map(lambda x: x, params)  # mutable copy
    p = jax.device_get(p)
    import flax

    p = flax.core.unfreeze(p) if hasattr(flax.core, "unfreeze") else p
    pp = p["params"]
    # torch Linear weight is (out, in) -> flax kernel (in, out)
    pp["self_attn"]["in_proj"]["kernel"] = np.asarray(
        sd["self_attn.in_proj_weight"]).T
    pp["self_attn"]["in_proj"]["bias"] = np.asarray(
        sd["self_attn.in_proj_bias"])
    pp["self_attn"]["out_proj"]["Dense_0"]["kernel"] = np.asarray(
        sd["self_attn.out_proj.weight"]).T
    pp["self_attn"]["out_proj"]["Dense_0"]["bias"] = np.asarray(
        sd["self_attn.out_proj.bias"])
    pp["multihead_attn"]["in_proj"]["kernel"] = np.asarray(
        sd["multihead_attn.in_proj_weight"]).T
    pp["multihead_attn"]["in_proj"]["bias"] = np.asarray(
        sd["multihead_attn.in_proj_bias"])
    pp["multihead_attn"]["out_proj"]["Dense_0"]["kernel"] = np.asarray(
        sd["multihead_attn.out_proj.weight"]).T
    pp["multihead_attn"]["out_proj"]["Dense_0"]["bias"] = np.asarray(
        sd["multihead_attn.out_proj.bias"])
    pp["linear1"]["Dense_0"]["kernel"] = np.asarray(sd["linear1.weight"]).T
    pp["linear1"]["Dense_0"]["bias"] = np.asarray(sd["linear1.bias"])
    pp["linear2"]["Dense_0"]["kernel"] = np.asarray(sd["linear2.weight"]).T
    pp["linear2"]["Dense_0"]["bias"] = np.asarray(sd["linear2.bias"])
    for i in (1, 2, 3):
        pp[f"norm{i}"]["scale"] = np.asarray(sd[f"norm{i}.weight"])
        pp[f"norm{i}"]["bias"] = np.asarray(sd[f"norm{i}.bias"])

    out = ours.apply({"params": pp}, batch_tgt, batch_mem, batch_qpos,
                     jnp.asarray(tgt_mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# BertLayer vs reference (modeling_capsbert) when importable
# ---------------------------------------------------------------------------

def test_bert_layer_exact_vs_reference(ref_modules):
    if ref_modules["modeling"] is None:
        pytest.skip("modeling_capsbert unimportable in this environment")
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.models.layers import BertLayer

    torch = ref_modules["torch"]
    mc = ref_modules["modeling"]

    config = mc.BertConfig(
        vocab_size_or_config_json_file=100,
        hidden_size=32,
        num_attention_heads=4,
        intermediate_size=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    ref_layer = mc.BertLayer(config)
    ref_layer.eval()

    rng = np.random.RandomState(3)
    b, l, d = 2, 7, 32
    x = rng.randn(b, l, d).astype(np.float32)
    mask01 = (rng.rand(b, l) > 0.2).astype(np.float32)
    ext = ((1.0 - mask01) * -10000.0)[:, None, None, :]

    with torch.no_grad():
        ref_out, _ = ref_layer(torch.tensor(x), torch.tensor(
            ext.astype(np.float32)))
    ref_out = _t2n(ref_out)

    ours = BertLayer(num_heads=4, head_dim=8, intermediate_size=64,
                     attn_dropout=0.0, hidden_dropout=0.0)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(ext))
    sd = {k: np.asarray(v) for k, v in ref_layer.state_dict().items()}
    p = jax.device_get(params)
    pp = p["params"]
    att = pp["attention"]
    att["self"]["query"]["Dense_0"]["kernel"] = sd[
        "attention.self.query.weight"].T
    att["self"]["query"]["Dense_0"]["bias"] = sd["attention.self.query.bias"]
    att["self"]["key"]["Dense_0"]["kernel"] = sd["attention.self.key.weight"].T
    att["self"]["key"]["Dense_0"]["bias"] = sd["attention.self.key.bias"]
    att["self"]["value"]["Dense_0"]["kernel"] = sd[
        "attention.self.value.weight"].T
    att["self"]["value"]["Dense_0"]["bias"] = sd["attention.self.value.bias"]
    att["output"]["dense"]["Dense_0"]["kernel"] = sd[
        "attention.output.dense.weight"].T
    att["output"]["dense"]["Dense_0"]["bias"] = sd[
        "attention.output.dense.bias"]
    att["output"]["ln"]["scale"] = sd["attention.output.LayerNorm.weight"]
    att["output"]["ln"]["bias"] = sd["attention.output.LayerNorm.bias"]
    ffn = pp["ffn"]
    ffn["intermediate"]["Dense_0"]["kernel"] = sd[
        "intermediate.dense.weight"].T
    ffn["intermediate"]["Dense_0"]["bias"] = sd["intermediate.dense.bias"]
    ffn["output"]["Dense_0"]["kernel"] = sd["output.dense.weight"].T
    ffn["output"]["Dense_0"]["bias"] = sd["output.dense.bias"]
    ffn["ln"]["scale"] = sd["output.LayerNorm.weight"]
    ffn["ln"]["bias"] = sd["output.LayerNorm.bias"]

    out, _ = ours.apply({"params": pp}, jnp.asarray(x), jnp.asarray(ext),
                        True, False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)
