"""--patches (linear patch tokenizer) and --vitInit (ViT r_layers).

Reference: ``modeling_capsbert.py:978-996`` (patch geometry; the reference's
own patches forward is latent-broken — 4-D view fed to 5-D unpacks,
``:1046-1057`` — so these tests pin our evident-intent implementation), and
``modeling_capsbert.py:1365-1390`` (load_vit_layers slicing + unmasked block
invocation) with parity against a torch rebuild of the timm Block the
reference slices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shgvqa_tpu.configs.config import tiny_test_config


# ---------------------------------------------------------------- patches

def test_patchify_clip_geometry_and_values():
    from shgvqa_tpu.models.visual import patchify_clip

    rng = np.random.RandomState(0)
    frames = rng.rand(2, 4, 32, 32, 3).astype(np.float32)
    out = np.asarray(patchify_clip(jnp.asarray(frames), visual_t=2, hw=2))
    # patch side = 32/2 = 16 -> flatten 16*16*3 = 768
    assert out.shape == (2, 2, 2, 2, 16 * 16 * 3)
    # temporal subsample 4 -> 2 is linspace-nearest: indices [0, 3]
    # (vis_utils.py:366-385 semantics)
    # spatial patch (i, j) is frames[:, t, 16i:16(i+1), 16j:16(j+1), :]
    want = frames[1, 3, 16:32, 0:16, :].reshape(-1)
    np.testing.assert_array_equal(out[1, 1, 1, 0], want)


def test_patch_tokenizer_shapes():
    from shgvqa_tpu.models.visual import VisualTokenizer, patchify_clip

    tok = VisualTokenizer(hidden_size=32, patches=True)
    frames = jnp.asarray(
        np.random.RandomState(1).rand(2, 4, 32, 32, 3), jnp.float32)
    feats = patchify_clip(frames, visual_t=2, hw=2)
    params = tok.init(jax.random.PRNGKey(0), feats)
    out = tok.apply(params, feats)
    assert out.shape == (2, 1 + 2 * 2 * 2, 32)
    # single linear projection, no convs
    assert "linear_encoding" in params["params"]
    assert "conv1" not in params["params"]


def test_patches_model_end_to_end_trains():
    """VideoShgVqaModel with patches: no backbone subtree, frames->logits,
    gradients reach the linear encoding."""
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    cfg = tiny_test_config(task="vqa")
    cfg = cfg.replace(encoder=cfg.encoder.__class__(
        **{**cfg.encoder.__dict__, "patches": True,
           "visual_feat_dim": 16 * 16 * 3}))
    model = VideoShgVqaModel(cfg)
    rng = np.random.RandomState(0)
    d = cfg.data
    batch = {
        "input_ids": rng.randint(
            1, cfg.encoder.vocab_size, (2, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((2, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((2, d.max_seq_length), np.int32),
        "frames": rng.rand(2, d.clip_len, d.image_size, d.image_size, 3
                           ).astype(np.float32),
        "visual_mask": np.ones((2, cfg.encoder.visual_seq_length), np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    assert "backbone" not in params["params"], "patches mode builds no backbone"
    tok = params["params"]["head"]["lxrt"]["encoder"]["visual_tokenizer"]
    assert "linear_encoding" in tok

    def loss(p):
        out = model.apply(p, batch, deterministic=True)
        return jnp.sum(out["logit"] ** 2)

    grads = jax.grad(loss)(params)
    g = grads["params"]["head"]["lxrt"]["encoder"]["visual_tokenizer"][
        "linear_encoding"]["kernel"]
    assert float(jnp.abs(g).max()) > 0.0


def test_patches_flag_flows_from_cli():
    from shgvqa_tpu.configs.cli import parse_reference_flags

    cfg = parse_reference_flags(
        ["--taskVQA", "--noCaps", "--patches", "--train", "train"],
        dataset="agqa")
    assert cfg.encoder.patches
    assert cfg.encoder.visual_feat_dim == 3072   # 32*32*3, :173-174


# ---------------------------------------------------------------- vitInit

def _make_vit_state_dict(num_blocks=3, d=32, seed=0):
    """Synthetic timm-named ViT state_dict (numpy)."""
    rng = np.random.RandomState(seed)
    sd = {}
    for i in range(num_blocks):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = rng.rand(d).astype(np.float32) + 0.5
        sd[f"{p}.norm1.bias"] = rng.randn(d).astype(np.float32) * 0.1
        sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * d, d).astype(np.float32) * 0.1
        sd[f"{p}.attn.qkv.bias"] = rng.randn(3 * d).astype(np.float32) * 0.1
        sd[f"{p}.attn.proj.weight"] = rng.randn(d, d).astype(np.float32) * 0.1
        sd[f"{p}.attn.proj.bias"] = rng.randn(d).astype(np.float32) * 0.1
        sd[f"{p}.norm2.weight"] = rng.rand(d).astype(np.float32) + 0.5
        sd[f"{p}.norm2.bias"] = rng.randn(d).astype(np.float32) * 0.1
        sd[f"{p}.mlp.fc1.weight"] = rng.randn(4 * d, d).astype(np.float32) * 0.1
        sd[f"{p}.mlp.fc1.bias"] = rng.randn(4 * d).astype(np.float32) * 0.1
        sd[f"{p}.mlp.fc2.weight"] = rng.randn(d, 4 * d).astype(np.float32) * 0.1
        sd[f"{p}.mlp.fc2.bias"] = rng.randn(d).astype(np.float32) * 0.1
    return sd


def test_vit_block_parity_vs_torch():
    """ViTBlock == timm Block topology (pre-LN, fused qkv, erf GeLU) on
    transplanted weights."""
    torch = pytest.importorskip("torch")
    from shgvqa_tpu.models.vit import ViTBlock
    from shgvqa_tpu.utils.torch_import import vit_block_params

    d, heads = 32, 4
    sd = _make_vit_state_dict(num_blocks=1, d=d)
    x = np.random.RandomState(3).randn(2, 9, d).astype(np.float32)

    tn = torch.nn.functional
    xt = torch.from_numpy(x)
    w = {k: torch.from_numpy(v) for k, v in sd.items()}
    h = tn.layer_norm(xt, (d,), w["blocks.0.norm1.weight"],
                      w["blocks.0.norm1.bias"], eps=1e-6)
    qkv = tn.linear(h, w["blocks.0.attn.qkv.weight"],
                    w["blocks.0.attn.qkv.bias"])
    qkv = qkv.reshape(2, 9, 3, heads, d // heads)
    q, k, v = (qkv[:, :, i].permute(0, 2, 1, 3) for i in range(3))
    att = ((q @ k.transpose(-2, -1)) * (d // heads) ** -0.5).softmax(dim=-1)
    ctx = (att @ v).permute(0, 2, 1, 3).reshape(2, 9, d)
    xt = xt + tn.linear(ctx, w["blocks.0.attn.proj.weight"],
                        w["blocks.0.attn.proj.bias"])
    h = tn.layer_norm(xt, (d,), w["blocks.0.norm2.weight"],
                      w["blocks.0.norm2.bias"], eps=1e-6)
    h = tn.gelu(tn.linear(h, w["blocks.0.mlp.fc1.weight"],
                          w["blocks.0.mlp.fc1.bias"]))
    want = (xt + tn.linear(h, w["blocks.0.mlp.fc2.weight"],
                           w["blocks.0.mlp.fc2.bias"])).numpy()

    blk = ViTBlock(num_heads=heads, head_dim=d // heads)
    got, _ = blk.apply({"params": vit_block_params(sd, "blocks.0")},
                       jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_vit_to_r_layers_slicing():
    from shgvqa_tpu.utils.torch_import import vit_to_r_layers

    sd = _make_vit_state_dict(num_blocks=4, d=32)
    tree = vit_to_r_layers(sd, num_layers=2, start_index=1)
    assert set(tree) == {"r_0", "r_1"}
    # r_0 takes block[start_index] (modeling_capsbert.py:1386-1388)
    np.testing.assert_array_equal(
        tree["r_0"]["qkv"]["kernel"], sd["blocks.1.attn.qkv.weight"].T)
    with pytest.raises(ValueError):
        vit_to_r_layers(sd, num_layers=3, start_index=2)   # 3+2 > 4


def test_vit_init_encoder_forward_and_structure():
    """TriStreamEncoder with vit_init: r_layers are ViT blocks (norm1/qkv
    param layout), forward runs, and the visual mask is ignored by r_layers
    exactly like the reference's unmasked invocation (:1401-1403)."""
    from shgvqa_tpu.models.encoder import LXRTModel

    cfg = tiny_test_config()
    enc_cfg = cfg.encoder.__class__(
        **{**cfg.encoder.__dict__, "vit_init": True})
    model = LXRTModel(enc_cfg, "float32")
    rng = np.random.RandomState(0)
    ids = rng.randint(1, enc_cfg.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    seg = np.zeros((2, 12), np.int32)
    # conv tokenizer needs T = visual_t + 8 (two VALID kernel-5 convs)
    feats = rng.randn(2, enc_cfg.visual_t + 8, 2, 2,
                      enc_cfg.visual_feat_dim).astype(np.float32)
    vmask = np.ones((2, enc_cfg.visual_seq_length), np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, seg, feats, vmask)
    r0 = params["params"]["encoder"]["r_0"]
    assert "norm1" in r0 and "qkv" in r0, "r_layers must be ViT blocks"

    pooled, *_ = model.apply(params, ids, mask, seg, feats, vmask)
    assert np.all(np.isfinite(np.asarray(pooled)))

    # masked-out visual tokens still influence nothing differently: ViT
    # blocks take no mask, so zeroing the visual mask must not change the
    # r-stream (only downstream cross-attention consumes the mask)
    vmask0 = np.zeros_like(vmask)
    pooled0, *_ = model.apply(params, ids, mask, seg, feats, vmask0)
    assert pooled0.shape == pooled.shape


def test_vit_init_rejects_scan_layers():
    from shgvqa_tpu.models.encoder import LXRTModel

    cfg = tiny_test_config()
    enc_cfg = cfg.encoder.__class__(
        **{**cfg.encoder.__dict__, "vit_init": True, "scan_layers": True})
    model = LXRTModel(enc_cfg, "float32")
    with pytest.raises(ValueError, match="vit_init"):
        model.init(jax.random.PRNGKey(0),
                   np.ones((1, 12), np.int32), np.ones((1, 12), np.int32),
                   np.zeros((1, 12), np.int32),
                   np.zeros((1, 10, 2, 2, 16), np.float32), None)


def test_encoder_root_handles_video_model_nesting():
    """Weight-surgery loaders must find the encoder under 'head' for
    VideoShgVqaModel trees (regression: load_vit_layers/load_bert_pretrained
    KeyError'd on frames-input models)."""
    from shgvqa_tpu.train.loop import Trainer

    flat = {"lxrt": {"encoder": {}}, "logit_fc": {}}
    owner, key = Trainer._encoder_root(flat)
    assert key == "lxrt" and owner is flat

    video = {"backbone": {}, "head": {"lxrt": {"encoder": {}}}}
    owner, key = Trainer._encoder_root(video)
    assert key == "lxrt" and owner is video["head"]

    qonly = {"bert_encoder": {}, "logit_fc": {}}
    owner, key = Trainer._encoder_root(qonly)
    assert key == "bert_encoder"

    with pytest.raises(ValueError):
        Trainer._encoder_root({"logit_fc": {}})


def test_vit_init_flag_flows_from_cli():
    from shgvqa_tpu.configs.cli import parse_reference_flags_with_extras

    cfg, extras = parse_reference_flags_with_extras(
        ["--taskHGQA", "--noCaps", "--vitInit", "--startIndex", "3",
         "--train", "train"], dataset="agqa")
    assert cfg.encoder.vit_init
    assert extras["start_index"] == 3
