"""Reference-checkpoint importer: trained .pth state_dicts -> our params.

Two contracts proven here:

1. (tiny) the PRODUCT importer (shgvqa_tpu/utils/ref_import.py) reproduces
   the transplant the parity tests do by hand: save the reference model's
   state_dict exactly like ``AGQA.save`` (``agqaHGQA.py:859-861``, incl. a
   DataParallel ``module.`` variant), import through
   ``Trainer.load``/``reference_to_variables``, and match reference forward
   outputs.

2. (flagship, slow) the BASELINE.md acceptance criterion at the PUBLISHED
   dims: reference AGQAModel at 768 hidden / 12 heads / 3072 FFN with
   llayers 5 / xlayers 2 / rlayers 5 / dlayers 5 (``README.md:48-51``),
   456+1 rel / 157+1 act classes, 171 answers — one batch through both
   frameworks with the imported weights, answer logits + HG logits + set
   predictions within tolerance.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/AGQA"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")


def _setup_ref_env(torch):
    """Importable reference env: sys.path + dead third-party stubs
    (same recipe as tests/test_full_model_train_parity.py)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("boto3", "timm"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.create_model = lambda *a, **k: None
            sys.modules[name] = stub
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnext101_32x8d = lambda *a, **k: None
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    if "botocore" not in sys.modules:
        botocore = types.ModuleType("botocore")
        exceptions = types.ModuleType("botocore.exceptions")
        exceptions.ClientError = type("ClientError", (Exception,), {})
        botocore.exceptions = exceptions
        sys.modules["botocore"] = botocore
        sys.modules["botocore.exceptions"] = exceptions
    argv, sys.argv = sys.argv, ["test"]
    try:
        import src.param as param
    finally:
        sys.argv = argv
    return param.args


def _write_bert_archive(d, vocab_size, hidden, heads, ffn, torch):
    d.mkdir(parents=True, exist_ok=True)
    (d / "bert_config.json").write_text(json.dumps({
        "vocab_size": vocab_size, "hidden_size": hidden,
        "num_hidden_layers": 2, "num_attention_heads": heads,
        "intermediate_size": ffn, "hidden_act": "gelu",
        "hidden_dropout_prob": 0.1, "attention_probs_dropout_prob": 0.1,
        "max_position_embeddings": 512, "type_vocab_size": 2,
        "initializer_range": 0.02,
    }))
    torch.save({}, d / "pytorch_model.bin")   # empty -> scratch init
    return d


# importing the module-scoped fixture makes it available here
from tests.test_full_model_train_parity import ref_setup  # noqa: F401


def test_tiny_checkpoint_roundtrip(ref_setup, tmp_path):
    """Product importer == the proven hand transplant, via a .pth file with
    DataParallel prefixes, loaded through the extensionless --load path."""
    import jax
    import jax.numpy as jnp

    from tests.test_full_model_train_parity import (
        _make_batch,
        _our_batch,
        _our_cfg,
        _ref_forward,
    )

    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.utils.ref_import import (
        load_reference_checkpoint,
        reference_to_variables,
    )

    torch, mc, am, args, ref_model = ref_setup
    cfg = _our_cfg()
    ours = ShgVqaModel(cfg)

    # save exactly like the reference does, with DataParallel prefixes
    sd = ref_model.state_dict()
    sd = {"module." + k: v for k, v in sd.items()}
    torch.save(sd, tmp_path / "BEST.pth")

    batch = _make_batch(np.random.RandomState(3))
    our_b = _our_batch(batch)
    params = jax.device_get(ours.init(
        jax.random.PRNGKey(0), our_b, deterministic=True))

    loaded = load_reference_checkpoint(str(tmp_path / "BEST"))  # no ext
    variables, report = reference_to_variables(loaded, params, cfg)
    assert len(report["mapped"]) > 50
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    ref_model.eval()
    with torch.no_grad():
        ref_out = _ref_forward(torch, ref_model, batch)
    out = ours.apply(variables, our_b, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logit"]),
                               ref_out[0].numpy(), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["rel_preds"]),
                               ref_out[1].numpy(), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["hg_logit"]),
                               ref_out[3].numpy(), rtol=5e-4, atol=5e-4)


def test_trainer_load_dispatches_pth(ref_setup, tmp_path):
    """--load path/BEST with a torch BEST.pth next to it goes through the
    reference importer (the reference's extensionless --load spelling,
    README.md:195), not the orbax restore."""
    import jax

    from tests.test_full_model_train_parity import (
        _make_batch,
        _our_batch,
        _our_cfg,
    )

    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.loop import Trainer

    torch, mc, am, args, ref_model = ref_setup
    torch.save(ref_model.state_dict(), tmp_path / "BEST.pth")

    cfg = _our_cfg().replace(output=str(tmp_path))
    trainer = Trainer(cfg, steps_per_epoch=1, model=ShgVqaModel(cfg))
    trainer.init_params(_our_batch(_make_batch(np.random.RandomState(4))))
    before = np.asarray(jax.device_get(
        trainer.params)["params"]["logit_fc"]["fc2"]["Dense_0"]["kernel"])
    trainer.load(str(tmp_path / "BEST"))
    after = np.asarray(jax.device_get(
        trainer.params)["params"]["logit_fc"]["fc2"]["Dense_0"]["kernel"])
    ref_w = ref_model.state_dict()["logit_fc.3.weight"].numpy().T
    assert not np.allclose(before, after)
    np.testing.assert_allclose(after, ref_w, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_flagship_dims_logits_parity(tmp_path):
    """BASELINE.md acceptance: answer logits match the PyTorch reference at
    the published flagship dims with weights imported by the product path."""
    torch = pytest.importorskip("torch")
    args = _setup_ref_env(torch)

    D, HEADS, FFN, VOCAB = 768, 12, 3072, 30522
    L, X, R, DLAYERS = 5, 2, 5, 5
    S, NUM_REL, NUM_ACT = 16, 8, 3
    REL_CLASSES, ACT_CLASSES, NUM_ANSWERS = 456, 157, 171
    VT, VHW, VFEAT = 8, 7, 2048
    T_IN, MAX_LEN = 16, 40

    args.backbone = "slow_r50"
    args.task_q = args.task_vqa = args.task_vhga = False
    args.task_hgqa = True
    args.gt_hg = False
    args.use_hg_mask = True   # our cfg masks hg tokens; match the reference
    args.cross_attn_type = "cross"
    args.no_caps = True
    args.from_scratch = False
    args.output_attention = False
    args.loss_hg_per_frame = True
    args.llayers, args.xlayers, args.rlayers = L, X, R
    args.dlayers = DLAYERS
    args.num_rel, args.num_act = NUM_REL, NUM_ACT
    args.emb_drop_rate = 0.15
    args.decoder_drop_rate = 0.15
    args.linear_cls = False

    import src.lxrt.modeling_capsbert as mc
    import src.lxrt.tokenization as tokzn

    archive = _write_bert_archive(
        tmp_path / "bert", VOCAB, D, HEADS, FFN, torch)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]",
                                "[MASK]"] + [f"t{i}" for i in range(95)]))
    mc.PRETRAINED_MODEL_ARCHIVE_MAP["bert-base-uncased"] = str(archive)
    tokzn.PRETRAINED_VOCAB_ARCHIVE_MAP["bert-base-uncased"] = str(vocab)

    mc.VISUAL_CONFIG.t = VT
    mc.VISUAL_CONFIG.hw = VHW
    mc.VISUAL_CONFIG.max_spatial_pos_emb = VT * VHW * VHW
    mc.VISUAL_CONFIG.visual_feat_dim = VFEAT
    mc.VISUAL_CONFIG.l_layers = L
    mc.VISUAL_CONFIG.x_layers = X
    mc.VISUAL_CONFIG.r_layers = R

    import src.lxrt.entry as entry

    entry.LXRTEncoder.dim = property(lambda self: D)

    import src.tasks.agqa_model as am

    class StubBackbone(torch.nn.Module):
        def __init__(self, name):
            super().__init__()

        def encode(self, x):
            return x

    real_backbone, am.VideoBackbone = am.VideoBackbone, StubBackbone
    try:
        torch.manual_seed(0)
        ref_model = am.AGQAModel(
            num_answers=NUM_ANSWERS, num_queries=S * NUM_REL,
            num_classes=REL_CLASSES, num_actions=ACT_CLASSES)
        ref_model.eval()
        torch.save(ref_model.state_dict(), tmp_path / "BEST.pth")
    finally:
        am.VideoBackbone = real_backbone

    # ---- our side: default Config IS the flagship topology ---------------
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.configs.config import Config
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.utils.ref_import import (
        load_reference_checkpoint,
        reference_to_variables,
    )

    cfg = Config(task="hgqa", compute_dtype="float32",
                 use_hg_mask=True)
    assert cfg.encoder.hidden_size == D and cfg.decoder.num_layers == DLAYERS
    ours = ShgVqaModel(cfg)

    rng = np.random.RandomState(11)
    b = 2
    batch = {
        "feats": rng.randn(b, VFEAT, T_IN, VHW, VHW).astype(np.float32),
        "boxes": np.ones((b, VT * VHW * VHW + 1), np.float32),
        "input_ids": rng.randint(1, VOCAB, (b, MAX_LEN)).astype(np.int64),
        "input_mask": (np.arange(MAX_LEN)[None, :]
                       < rng.randint(6, MAX_LEN, (b, 1))).astype(np.int64),
        "segment_ids": np.zeros((b, MAX_LEN), np.int64),
        "hg_mask": rng.randint(
            0, 2, (b, S, NUM_ACT + NUM_REL)).astype(np.int64),
    }

    with torch.no_grad():
        from src.lxrt.entry import generate_rel_target_mask

        from shgvqa_tpu.data.featurize import hg_segment_ids

        ref_out = ref_model(
            torch.tensor(batch["feats"]), torch.tensor(batch["boxes"]),
            input_ids=torch.tensor(batch["input_ids"]),
            input_masks=torch.tensor(batch["input_mask"]),
            segment_ids=torch.tensor(batch["segment_ids"]),
            rel_segment_ids=torch.tensor(
                hg_segment_ids(S, NUM_REL)[None].repeat(b, 0)
                .astype(np.int64)),
            rel_tgt_mask=torch.tensor(np.asarray(
                generate_rel_target_mask(S, NUM_REL), np.float32)),
            act_segment_ids=torch.tensor(
                hg_segment_ids(S, NUM_ACT)[None].repeat(b, 0)
                .astype(np.int64)),
            act_tgt_mask=torch.tensor(np.asarray(
                generate_rel_target_mask(S, NUM_ACT), np.float32)),
            hg_mask=torch.tensor(batch["hg_mask"]),
        )

    our_b = {
        "input_ids": batch["input_ids"].astype(np.int32),
        "input_mask": batch["input_mask"].astype(np.int32),
        "segment_ids": batch["segment_ids"].astype(np.int32),
        "visual_feats": batch["feats"].transpose(0, 2, 3, 4, 1),
        "visual_mask": batch["boxes"].astype(np.int32),
        "hg_mask": batch["hg_mask"].astype(np.int32),
    }
    params = jax.device_get(ours.init(
        jax.random.PRNGKey(0), our_b, deterministic=True))
    loaded = load_reference_checkpoint(str(tmp_path / "BEST.pth"))
    variables, report = reference_to_variables(loaded, params, cfg)
    assert len(report["mapped"]) > 200, len(report["mapped"])
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    out = ours.apply(variables, our_b, deterministic=True)

    np.testing.assert_allclose(np.asarray(out["logit"]),
                               ref_out[0].numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["rel_preds"]),
                               ref_out[1].numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["act_preds"]),
                               ref_out[2].numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["hg_logit"]),
                               ref_out[3].numpy(), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_flagship_dims_train_step_parity(tmp_path):
    """BASELINE.md acceptance, backward+optimizer at the PUBLISHED dims
    (round-3 verdict item 4): reference AGQAModel at 768/12/3072, 5/2/5/5
    layers trains TWO full steps (HGQA loss composition agqaHGQA.py:344-392,
    grad-clip 5.0, BertAdam warmup_linear optimization.py:38-43,175-178)
    against our step from the SAME product-imported weights and the SAME
    batches; losses and post-step parameter DELTAS must agree.

    warmup=0.0 so the very first update is taken at full lr (with the
    reference's pre-increment schedule, warmup>0 makes step-1 lr exactly 0
    on both sides, which would prove nothing about the gradients)."""
    torch = pytest.importorskip("torch")
    args = _setup_ref_env(torch)

    D, HEADS, FFN, VOCAB = 768, 12, 3072, 30522
    L, X, R, DLAYERS = 5, 2, 5, 5
    S, NUM_REL, NUM_ACT = 16, 8, 3
    REL_CLASSES, ACT_CLASSES, NUM_ANSWERS = 456, 157, 171
    VT, VHW, VFEAT = 8, 7, 2048
    T_IN, MAX_LEN = 16, 40
    LR, T_TOTAL, STEPS = 1e-3, 10, 2

    args.backbone = "slow_r50"
    args.task_q = args.task_vqa = args.task_vhga = False
    args.task_hgqa = True
    args.gt_hg = False
    args.use_hg_mask = True
    args.cross_attn_type = "cross"
    args.no_caps = True
    args.from_scratch = False
    args.output_attention = False
    args.loss_hg_per_frame = True
    args.llayers, args.xlayers, args.rlayers = L, X, R
    args.dlayers = DLAYERS
    args.num_rel, args.num_act = NUM_REL, NUM_ACT
    args.emb_drop_rate = 0.0
    args.decoder_drop_rate = 0.0
    args.linear_cls = False

    import src.lxrt.modeling_capsbert as mc
    import src.lxrt.tokenization as tokzn

    archive = _write_bert_archive(
        tmp_path / "bert", VOCAB, D, HEADS, FFN, torch)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]",
                                "[MASK]"] + [f"t{i}" for i in range(95)]))
    mc.PRETRAINED_MODEL_ARCHIVE_MAP["bert-base-uncased"] = str(archive)
    tokzn.PRETRAINED_VOCAB_ARCHIVE_MAP["bert-base-uncased"] = str(vocab)

    mc.VISUAL_CONFIG.t = VT
    mc.VISUAL_CONFIG.hw = VHW
    mc.VISUAL_CONFIG.max_spatial_pos_emb = VT * VHW * VHW
    mc.VISUAL_CONFIG.visual_feat_dim = VFEAT
    mc.VISUAL_CONFIG.l_layers = L
    mc.VISUAL_CONFIG.x_layers = X
    mc.VISUAL_CONFIG.r_layers = R

    import src.lxrt.entry as entry

    entry.LXRTEncoder.dim = property(lambda self: D)

    import src.tasks.agqa_model as am

    class StubBackbone(torch.nn.Module):
        def __init__(self, name):
            super().__init__()

        def encode(self, x):
            return x

    real_backbone, am.VideoBackbone = am.VideoBackbone, StubBackbone
    try:
        torch.manual_seed(0)
        ref_model = am.AGQAModel(
            num_answers=NUM_ANSWERS, num_queries=S * NUM_REL,
            num_classes=REL_CLASSES, num_actions=ACT_CLASSES)
        torch.save(ref_model.state_dict(), tmp_path / "BEST.pth")
    finally:
        am.VideoBackbone = real_backbone
    # train mode with EVERY dropout off (incl. the relation_query_embed
    # default-0.1 quirk) so both sides are deterministic
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    ref_model.train()

    # ---- identical batches with HG labels -------------------------------
    def make_batch(rng, b=2):
        batch = {
            "feats": rng.randn(b, VFEAT, T_IN, VHW, VHW).astype(np.float32),
            "boxes": np.ones((b, VT * VHW * VHW + 1), np.float32),
            "input_ids": rng.randint(
                1, VOCAB, (b, MAX_LEN)).astype(np.int64),
            "input_mask": (np.arange(MAX_LEN)[None, :]
                           < rng.randint(6, MAX_LEN, (b, 1))).astype(
                               np.int64),
            "segment_ids": np.zeros((b, MAX_LEN), np.int64),
            "rel_labels": rng.randint(
                1, REL_CLASSES + 1, (b, S, NUM_REL)).astype(np.int64),
            "rel_lengths": rng.randint(
                1, NUM_REL + 1, (b, S)).astype(np.int64),
            "act_labels": rng.randint(
                1, ACT_CLASSES + 1, (b, S, NUM_ACT)).astype(np.int64),
            "act_lengths": rng.randint(
                1, NUM_ACT + 1, (b, S)).astype(np.int64),
            "hg_mask": rng.randint(
                0, 2, (b, S, NUM_ACT + NUM_REL)).astype(np.int64),
        }
        for lbl, lng, k in (("rel_labels", "rel_lengths", NUM_REL),
                            ("act_labels", "act_lengths", NUM_ACT)):
            batch[lbl] = batch[lbl] * (np.arange(k)[None, None, :]
                                       < batch[lng][:, :, None])
        tgt = np.zeros((b, NUM_ANSWERS), np.float32)
        tgt[np.arange(b), rng.randint(NUM_ANSWERS, size=b)] = 1.0
        batch["target"] = tgt
        return batch

    batches = [make_batch(np.random.RandomState(700 + i))
               for i in range(STEPS)]

    # ---- reference: 2 train steps (agqaHGQA.py:344-392) -----------------
    import torch.nn.functional as F

    from src.lxrt.matcher import HungarianMatcher
    from src.lxrt.optimization import BertAdam

    matcher = HungarianMatcher(cost_class=1, loss_hg_per_frame=True,
                               clip_len=S)
    empty_w_rel = torch.ones(REL_CLASSES + 1)
    empty_w_rel[0] = 0.1
    empty_w_act = torch.ones(ACT_CLASSES + 1)
    empty_w_act[0] = 0.1
    optim = BertAdam(list(ref_model.parameters()), lr=LR, warmup=0.0,
                     t_total=T_TOTAL)

    def ref_set_loss(logits, labels, lengths, empty_weight, n_slot):
        b = logits.shape[0]
        tgts = [{"labels": [torch.tensor(labels[i, s, :lengths[i, s]])
                            for s in range(S)]} for i in range(b)]
        indices = matcher({"pred_logits": logits}, tgts)
        flat = [t for item in tgts for t in item["labels"]]
        tco = torch.cat([t[J] for t, (_, J) in zip(flat, indices)])
        lf = logits.reshape(b * S, n_slot, -1)
        tc = torch.full(lf.shape[:2], 0, dtype=torch.int64)
        bidx = torch.cat([torch.full_like(src, i)
                          for i, (src, _) in enumerate(indices)])
        sidx = torch.cat([src for (src, _) in indices])
        tc[bidx, sidx] = tco
        return F.cross_entropy(lf.transpose(1, 2), tc, empty_weight)

    from src.lxrt.entry import generate_rel_target_mask

    from shgvqa_tpu.data.featurize import hg_segment_ids

    def ref_forward(b):
        nb = b["feats"].shape[0]
        return ref_model(
            torch.tensor(b["feats"]), torch.tensor(b["boxes"]),
            input_ids=torch.tensor(b["input_ids"]),
            input_masks=torch.tensor(b["input_mask"]),
            segment_ids=torch.tensor(b["segment_ids"]),
            rel_segment_ids=torch.tensor(
                hg_segment_ids(S, NUM_REL)[None].repeat(nb, 0)
                .astype(np.int64)),
            rel_tgt_mask=torch.tensor(np.asarray(
                generate_rel_target_mask(S, NUM_REL), np.float32)),
            act_segment_ids=torch.tensor(
                hg_segment_ids(S, NUM_ACT)[None].repeat(nb, 0)
                .astype(np.int64)),
            act_tgt_mask=torch.tensor(np.asarray(
                generate_rel_target_mask(S, NUM_ACT), np.float32)),
            hg_mask=torch.tensor(b["hg_mask"]),
        )

    pre = {k: np.array(v.detach().numpy(), copy=True)
           for k, v in ref_model.state_dict().items()}
    ref_losses = []
    for b in batches:
        optim.zero_grad()
        out = ref_forward(b)
        logit, rel_logit, act_logit, hg_logit, _ = out
        bce = torch.nn.BCEWithLogitsLoss()
        total = bce(hg_logit, torch.tensor(b["target"])) * hg_logit.size(1)
        total = total + ref_set_loss(rel_logit, b["rel_labels"],
                                     b["rel_lengths"], empty_w_rel, NUM_REL)
        total = total + ref_set_loss(act_logit, b["act_labels"],
                                     b["act_lengths"], empty_w_act, NUM_ACT)
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 5.0)
        optim.step()
        ref_losses.append(float(total.detach()))
    post = {k: np.array(v.detach().numpy(), copy=True)
            for k, v in ref_model.state_dict().items()}

    # ---- our side: product import, same 2 steps -------------------------
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from shgvqa_tpu.configs.config import Config
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses
    from shgvqa_tpu.utils.ref_import import (
        load_reference_checkpoint,
        reference_to_variables,
    )

    cfg = Config(task="hgqa", compute_dtype="float32", use_hg_mask=True)
    cfg = cfg.replace(
        encoder=dataclasses.replace(
            cfg.encoder, hidden_dropout=0.0, attention_dropout=0.0),
        decoder=dataclasses.replace(
            cfg.decoder, dropout=0.0, emb_dropout=0.0))
    assert cfg.encoder.hidden_size == D and cfg.decoder.num_layers == DLAYERS
    ours = ShgVqaModel(cfg)

    def our_batch(b):
        return {
            "input_ids": b["input_ids"].astype(np.int32),
            "input_mask": b["input_mask"].astype(np.int32),
            "segment_ids": b["segment_ids"].astype(np.int32),
            "visual_feats": b["feats"].transpose(0, 2, 3, 4, 1),
            "visual_mask": b["boxes"].astype(np.int32),
            "hg_mask": b["hg_mask"].astype(np.int32),
            "rel_labels": b["rel_labels"].astype(np.int32),
            "rel_lengths": b["rel_lengths"].astype(np.int32),
            "act_labels": b["act_labels"].astype(np.int32),
            "act_lengths": b["act_lengths"].astype(np.int32),
            "target": b["target"],
        }

    params = jax.device_get(ours.init(
        jax.random.PRNGKey(0), our_batch(batches[0]), deterministic=True))
    loaded = load_reference_checkpoint(str(tmp_path / "BEST.pth"))
    variables, report = reference_to_variables(loaded, params, cfg)
    assert len(report["mapped"]) > 200, len(report["mapped"])
    params = jax.tree_util.tree_map(jnp.asarray, variables)

    # torch skips None-grad params (x_layers/pooler under HGQA): mask the
    # structurally-disconnected subtrees exactly like the product driver
    from shgvqa_tpu.train.step import connected_param_mask

    conn = connected_param_mask(params, cfg)
    assert not all(jax.tree_util.tree_leaves(conn)), \
        "expected disconnected subtrees under HGQA"
    tx = make_optimizer(lr=LR, t_total=T_TOTAL, warmup=0.0, flat=False,
                        trainable_mask=conn)
    opt_state = tx.init(params)

    def loss_fn(p, b):
        out = ours.apply(p, b, deterministic=True)
        return compute_losses(cfg, out, b)

    @jax.jit
    def step(p, o, b):
        (total, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, b)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, total

    our_losses = []
    for b in batches:
        params, opt_state, total = step(params, opt_state, our_batch(b))
        our_losses.append(float(total))

    # step-1 loss is pure forward parity; step-2 loss additionally proves
    # the step-1 gradient + clip + BertAdam update landed identically
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=5e-3)

    # ---- post-step parameter DELTAS agree -------------------------------
    p_np = jax.device_get(params)["params"]
    bert = "lxrt_encoder.model.bert"
    checks = [
        ("word_embeddings",
         p_np["lxrt"]["embeddings"]["word_embeddings"]["embedding"],
         f"{bert}.embeddings.word_embeddings.weight"),
        ("logit_fc.fc2",
         p_np["logit_fc"]["fc2"]["Dense_0"]["kernel"],
         "logit_fc.3.weight"),
        ("class_embed.fc1",
         p_np["class_embed"]["fc1"]["Dense_0"]["kernel"],
         "class_embed.0.weight"),
        ("rel_decoder.l0.self_attn",
         p_np["rel_decoder"]["layer_0"]["self_attn"]["in_proj"]["kernel"],
         "rel_decoder.layers.0.self_attn.in_proj_weight"),
        ("relation_query_embed",
         p_np["relation_query_embed"]["word_embeddings"]["embedding"],
         "relation_query_embed.word_embeddings.weight"),
    ]
    for name, ours_t, ref_key in checks:
        ref_delta = post[ref_key] - pre[ref_key]
        if ref_key.endswith("weight") and ours_t.ndim == 2 \
                and "embeddings" not in ref_key:
            ref_delta = ref_delta.T
        our_delta = np.asarray(ours_t) - (
            pre[ref_key].T if (ref_key.endswith("weight")
                               and ours_t.ndim == 2
                               and "embeddings" not in ref_key)
            else pre[ref_key])
        dn = np.linalg.norm(ref_delta)
        assert dn > 0, f"{name}: reference delta is zero (degenerate test)"
        err = np.linalg.norm(our_delta - ref_delta) / dn
        assert err < 5e-2, f"{name}: relative delta error {err:.4f}"

    # grad-DISCONNECTED under HGQA: torch's BertAdam never touches the
    # x_layers (p.grad is None -> continue, optimization.py:131-132); with
    # the connected mask ours must leave them bit-identical too
    if "visual_attention" in p_np["lxrt"]["encoder"].get("x_tied", {}):
        x_key = f"{bert}.encoder.x_layers.0.visual_attention.att.query.weight"
        assert np.array_equal(post[x_key], pre[x_key]), \
            "reference moved a param expected to be grad-disconnected"
        ours_x = np.asarray(
            p_np["lxrt"]["encoder"]["x_tied"]["visual_attention"]["att"]
            ["query"]["Dense_0"]["kernel"])
        np.testing.assert_array_equal(ours_x, pre[x_key].T)
