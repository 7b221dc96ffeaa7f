"""--sharedWeights (one weight set for both streams) and --freezeWeights
(freeze the LXRT encoder except x_layers).

Reference: ``modeling_capsbert.py:1366,1471-1477`` (shared_weights routes the
visual stream through ``self.layer``) and ``:1393-1397,1905-1909,2183-2184``
(freeze_weights zeroes requires_grad on embeddings + encoder except names
containing 'x_layers'; pooler/decoders/heads stay trainable).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shgvqa_tpu.configs.config import tiny_test_config


def _enc_cfg(**kw):
    cfg = tiny_test_config()
    return cfg.encoder.__class__(**{**cfg.encoder.__dict__, **kw})


def _inputs(enc_cfg, rng=None):
    rng = rng or np.random.RandomState(0)
    ids = rng.randint(1, enc_cfg.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    seg = np.zeros((2, 12), np.int32)
    feats = rng.randn(2, enc_cfg.visual_t + 8, 2, 2,
                      enc_cfg.visual_feat_dim).astype(np.float32)
    vmask = np.ones((2, enc_cfg.visual_seq_length), np.int32)
    return ids, mask, seg, feats, vmask


def test_shared_weights_one_weight_set():
    """shared_weights: no r_* params exist; the visual stream consumes the
    language layers (their gradient receives visual-path contributions)."""
    from shgvqa_tpu.models.encoder import LXRTModel

    enc_cfg = _enc_cfg(shared_weights=True)
    model = LXRTModel(enc_cfg, "float32")
    ids, mask, seg, feats, vmask = _inputs(enc_cfg)
    params = model.init(jax.random.PRNGKey(0), ids, mask, seg, feats, vmask)
    enc = params["params"]["encoder"]
    assert "r_0" not in enc, "shared_weights must not allocate r_layers"
    assert "l_0" in enc

    # visual input influences the l-layer gradients only through sharing:
    # perturbing feats changes d(pooled)/d(l_0) — impossible with separate
    # r_layers' forward if l layers only saw text
    def pooled_sum(p, f):
        out, *_ = model.apply(p, ids, mask, seg, f, vmask)
        return jnp.sum(out)

    g1 = jax.grad(pooled_sum)(params, jnp.asarray(feats))
    g2 = jax.grad(pooled_sum)(params, jnp.asarray(feats) * 2.0)
    l0_1 = jax.tree_util.tree_leaves(g1["params"]["encoder"]["l_0"])
    l0_2 = jax.tree_util.tree_leaves(g2["params"]["encoder"]["l_0"])
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(l0_1, l0_2)]
    assert max(diffs) > 0.0, "l_0 gradient must depend on the visual input"


def test_shared_weights_flag_flows_from_cli():
    from shgvqa_tpu.configs.cli import parse_reference_flags

    cfg = parse_reference_flags(
        ["--taskVQA", "--sharedWeights", "--train", "train"], dataset="agqa")
    assert cfg.encoder.shared_weights


def test_shared_weights_rejects_scan_layers():
    from shgvqa_tpu.models.encoder import LXRTModel

    enc_cfg = _enc_cfg(shared_weights=True, scan_layers=True)
    model = LXRTModel(enc_cfg, "float32")
    ids, mask, seg, feats, vmask = _inputs(enc_cfg)
    with pytest.raises(ValueError, match="shared_weights"):
        model.init(jax.random.PRNGKey(0), ids, mask, seg, feats, vmask)


def test_freeze_weights_mask_scope():
    """_trainable_mask under --freezeWeights: embeddings + encoder frozen
    EXCEPT x_layers; pooler/decoders/heads/backbone-policy respected."""
    from shgvqa_tpu.cli.common import _trainable_mask

    params = {"params": {
        "backbone": {"stem_conv": {"kernel": 0}},
        "head": {
            "lxrt": {
                "embeddings": {"word_embeddings": {"embedding": 0}},
                "encoder": {
                    "l_0": {"w": 0},
                    "r_0": {"w": 0},
                    "x_tied": {"w": 0},
                    "visual_tokenizer": {"conv1": {"kernel": 0}},
                },
                "pooler": {"dense": {"kernel": 0}},
            },
            "rel_decoder": {"w": 0},
            "logit_fc": {"w": 0},
        },
    }}

    class Cfg:
        freeze_backbone = True
        freeze_weights = True

    m = _trainable_mask(params, Cfg)["params"]
    assert m["backbone"]["stem_conv"]["kernel"] is False
    lx = m["head"]["lxrt"]
    assert lx["embeddings"]["word_embeddings"]["embedding"] is False
    assert lx["encoder"]["l_0"]["w"] is False
    assert lx["encoder"]["r_0"]["w"] is False
    assert lx["encoder"]["visual_tokenizer"]["conv1"]["kernel"] is False
    assert lx["encoder"]["x_tied"]["w"] is True      # x_layers stay live
    assert lx["pooler"]["dense"]["kernel"] is True
    assert m["head"]["rel_decoder"]["w"] is True
    assert m["head"]["logit_fc"]["w"] is True

    # q-only tree: LanguageEncoder layers at the bert_encoder top level
    qparams = {"params": {"bert_encoder": {
        "embeddings": {"e": 0}, "l_0": {"w": 0}, "pooler": {"p": 0}},
        "logit_fc": {"w": 0}}}

    class QCfg:
        freeze_backbone = False
        freeze_weights = True

    qm = _trainable_mask(qparams, QCfg)["params"]
    assert qm["bert_encoder"]["embeddings"]["e"] is False
    assert qm["bert_encoder"]["l_0"]["w"] is False
    assert qm["bert_encoder"]["pooler"]["p"] is True
    assert qm["logit_fc"]["w"] is True


def test_freeze_weights_driver_one_step(tmp_path, monkeypatch):
    """Driver-style: Trainer with the freeze mask — frozen leaves are
    bitwise stable over a real train() epoch; x_layers change.

    Task 'vqa': in HGQA the pooled logit head is UNSUPERVISED
    (agqaHGQA.py:344-378), so the lxrt x_layers legitimately receive zero
    gradient there — VQA supervises them."""
    from shgvqa_tpu.cli.common import _trainable_mask
    from shgvqa_tpu.data.pipeline import Batcher
    from shgvqa_tpu.train.loop import Trainer
    from tests.test_train_loop import _make_items

    monkeypatch.setenv("SHGVQA_FLAT_STATE", "1")
    # default 2 epochs: BertAdam's FIRST update has lr == 0 by reference
    # semantics (schedule read pre-increment, optimization.py:160-170), so a
    # single-step run moves nothing
    cfg = tiny_test_config(task="vqa")
    cfg = cfg.replace(output=str(tmp_path), freeze_weights=True)
    items = _make_items(cfg, n=2, seed=0)
    batcher = Batcher(items, batch_size=2, shuffle=False, seed=0)
    first = next(batcher.epoch(0))
    first = {k: v for k, v in first.items()
             if k not in ("ques_id", "n_valid")}

    boot = Trainer(cfg, steps_per_epoch=1)
    boot.init_params(first)
    params0 = jax.device_get(boot.params)
    mask = _trainable_mask(params0, cfg)
    tr = Trainer(cfg, steps_per_epoch=1, model=boot.model,
                 trainable_mask=mask)
    tr.params = boot.params
    tr._reset_opt()
    tr.train(lambda epoch: batcher.epoch(epoch), evaluate=None)
    tr._sync_params_from_flat()
    params1 = jax.device_get(tr.params)

    enc0 = params0["params"]["lxrt"]
    enc1 = params1["params"]["lxrt"]
    emb0 = jax.tree_util.tree_leaves(enc0["embeddings"])
    emb1 = jax.tree_util.tree_leaves(enc1["embeddings"])
    for a, b in zip(emb0, emb1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    l0 = jax.tree_util.tree_leaves(enc0["encoder"]["l_0"])
    l1 = jax.tree_util.tree_leaves(enc1["encoder"]["l_0"])
    for a, b in zip(l0, l1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    x0 = np.concatenate([np.ravel(x) for x in
                         jax.tree_util.tree_leaves(enc0["encoder"]["x_tied"])])
    x1 = np.concatenate([np.ravel(x) for x in
                         jax.tree_util.tree_leaves(enc1["encoder"]["x_tied"])])
    assert np.abs(x0 - x1).max() > 0.0, "x_layers must keep training"


def test_caps_cross_attn_gating():
    """Capsule path: x_layers exist only with --crossAttn
    (modeling_capsbert.py:1360-1363,1485-1488; argparse default False)."""
    import dataclasses

    from shgvqa_tpu.models.shgvqa import ShgVqaModel

    base = tiny_test_config()
    rng = np.random.RandomState(0)
    d = base.data

    def build(caps_cross_attn):
        enc = dataclasses.replace(
            base.encoder, no_caps=False, num_prim_caps=4, num_vis_caps=3,
            pose_dim=2, visual_t=d.clip_len, caps_cross_attn=caps_cross_attn)
        cfg = tiny_test_config(task="vqa", encoder=enc)
        model = ShgVqaModel(cfg)
        batch = {
            "input_ids": rng.randint(
                1, enc.vocab_size, (2, d.max_seq_length)).astype(np.int32),
            "input_mask": np.ones((2, d.max_seq_length), np.int32),
            "segment_ids": np.zeros((2, d.max_seq_length), np.int32),
            "visual_feats": rng.randn(
                2, d.clip_len, enc.visual_hw, enc.visual_hw,
                enc.visual_feat_dim).astype(np.float32),
            "visual_mask": np.ones((2, enc.visual_seq_length), np.int32),
            "target": np.eye(cfg.num_answers, dtype=np.float32)[:2],
        }
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        out = model.apply(params, batch, deterministic=True)
        return params, out, cfg

    p_off, out_off, cfg = build(False)
    assert "x_tied" not in p_off["params"]["lxrt"]["encoder"]
    assert np.isfinite(np.asarray(out_off["logit"])).all()

    p_on, out_on, _ = build(True)
    assert "x_tied" in p_on["params"]["lxrt"]["encoder"]
    assert np.isfinite(np.asarray(out_on["logit"])).all()


def test_caps_cross_attn_flag_flows_from_cli():
    from shgvqa_tpu.configs.cli import parse_reference_flags

    cfg = parse_reference_flags(
        ["--taskVQA", "--crossAttn", "--train", "train"], dataset="agqa")
    assert cfg.encoder.caps_cross_attn
    cfg = parse_reference_flags(
        ["--taskVQA", "--train", "train"], dataset="agqa")
    assert not cfg.encoder.caps_cross_attn
