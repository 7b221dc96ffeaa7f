"""FULL-SYSTEM training parity vs the reference (the strongest offline
substitute for a real-data accuracy run, VERDICT item 8).

Builds the reference's ACTUAL AGQAModel (tasks/agqa_model.py) offline --
local tiny-bert archive for from_pretrained, stubbed VideoBackbone so
features pass through, tiny VisualConfig geometry -- transplants every
weight into our ShgVqaModel, then runs SEVERAL full train steps on both
sides with identical batches: forward (tri-stream encoder + both HG
decoders + HGQ cross encoder), the exact HGQA loss composition
(bce(hg_logit)*num_answers + Hungarian-matched rel/act CE with eos 0.1,
agqaHGQA.py:344-378), grad-clip 5.0, and BertAdam with the warmup_linear
schedule.  Loss trajectories and post-training parameters must agree.

If this holds, every training-relevant component matches end to end; the
only unproven inputs on real data are the artifacts themselves (covered by
test_real_artifacts.py) and the pretrained weights (test_bert_import.py /
test_slow_r50_convert.py).
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

# tiny geometry (reference hardcodes 16 situations and 16*3 act queries,
# agqa_model.py:33-34, :255)
D, HEADS, FFN, VOCAB = 24, 4, 48, 60
L, X, R, DLAYERS = 2, 2, 2, 2
S, NUM_REL, NUM_ACT = 16, 3, 3
REL_CLASSES, ACT_CLASSES = 9, 5
NUM_ANSWERS = 7
# the reference reshapes hg tokens by the FEATURE temporal length
# (agqa_model.py:255 view(B, T, ...) with T = feat.size(2)), so the input
# clip length must equal num_situations: T_IN = 16 = S, visual_t = 8 after
# the two temporal-5 convs -- the real geometry relation
VT, VHW, VFEAT = 8, 3, 16   # visual tokens 8*3*3+1 = 73
T_IN = VT + 8               # conv tokenizer eats 8 frames
MAX_LEN = 40                # MAX_STAR_LENGTH, agqa_model.py:15
LR, STEPS = 1e-3, 4


@pytest.fixture(scope="module")
def ref_setup(tmp_path_factory):
    torch = pytest.importorskip("torch")
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

    # src.param parses sys.argv at import (param.py:201)
    argv, sys.argv = sys.argv, ["test"]
    try:
        import src.param as param
    finally:
        sys.argv = argv
    args = param.args
    args.backbone = "slow_r50"
    args.task_q = args.task_vqa = args.task_vhga = False
    args.task_hgqa = True
    args.gt_hg = False
    # our cfg sets use_hg_mask=True; mirror it (agqa_model.py:261 otherwise
    # silently drops the mask, which slips under tiny-dims tolerance but
    # diverges at flagship dims)
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

    # local tiny bert archive for from_pretrained + tokenizer vocab
    d = tmp_path_factory.mktemp("tiny_bert")
    (d / "bert_config.json").write_text(json.dumps({
        "vocab_size": VOCAB, "hidden_size": D, "num_hidden_layers": 2,
        "num_attention_heads": HEADS, "intermediate_size": FFN,
        "hidden_act": "gelu", "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0,
        "max_position_embeddings": 64, "type_vocab_size": 2,
        "initializer_range": 0.02,
    }))
    torch.save({}, d / "pytorch_model.bin")   # empty: scratch init
    vocab = d / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"tok{i}" for i in range(VOCAB - 5)]))

    import src.lxrt.modeling_capsbert as mc
    import src.lxrt.tokenization as tokzn

    mc.PRETRAINED_MODEL_ARCHIVE_MAP["bert-base-uncased"] = str(d)
    tokzn.PRETRAINED_VOCAB_ARCHIVE_MAP["bert-base-uncased"] = str(vocab)

    mc.VISUAL_CONFIG.t = VT
    mc.VISUAL_CONFIG.max_spatial_pos_emb = VT * VHW * VHW
    mc.VISUAL_CONFIG.visual_feat_dim = VFEAT

    import src.lxrt.entry as entry

    # LXRTEncoder.dim is hardcoded 768 (entry.py:186) and sizes every
    # downstream head/decoder; point it at the tiny hidden dim
    entry.LXRTEncoder.dim = property(lambda self: D)

    import src.tasks.agqa_model as am

    class StubBackbone(torch.nn.Module):
        def __init__(self, name):
            super().__init__()

        def encode(self, x):
            return x

    am.VideoBackbone = StubBackbone

    torch.manual_seed(0)
    model = am.AGQAModel(
        num_answers=NUM_ANSWERS, num_queries=S * NUM_REL,
        num_classes=REL_CLASSES, num_actions=ACT_CLASSES)
    # VISUAL_CONFIG.hw is set from args.HW (entry.py:134) AFTER we already
    # sized things; the conv tokenizer hardcodes 2048 channels -- shrink
    mc.VISUAL_CONFIG.hw = VHW
    torch.manual_seed(33)
    model.lxrt_encoder.model.bert.encoder.visn_fc.conv[1] = torch.nn.Conv3d(
        VFEAT, D, (5, 3, 3))
    model.lxrt_encoder.model.bert.encoder.visn_fc.conv[4] = torch.nn.Conv3d(
        D, D, (5, 3, 3))
    # rebuild the pos-emb table at tiny geometry
    pe = model.lxrt_encoder.model.bert.encoder.visn_fc.position_encoding
    pe.pe = torch.nn.Embedding(VT * VHW * VHW + 1, D)
    # reference quirk: relation_query_embed is built WITHOUT the dropout
    # arg -> default 0.1 even when --embDropRate 0 (agqa_model.py:61 vs :64;
    # our model preserves the quirk, tests run deterministic) -- zero it so
    # both sides are noise-free for the trajectory comparison
    model.relation_query_embed.dropout.p = 0.0
    model.train()
    return torch, mc, am, args, model


def _make_batch(rng, b=2):
    batch = {
        "feats": rng.randn(b, VFEAT, T_IN, VHW, VHW).astype(np.float32),
        "boxes": np.ones((b, VT * VHW * VHW + 1), np.float32),
        "input_ids": rng.randint(1, VOCAB, (b, MAX_LEN)).astype(np.int64),
        "input_mask": (np.arange(MAX_LEN)[None, :]
                       < rng.randint(5, MAX_LEN, (b, 1))).astype(np.int64),
        "rel_labels": rng.randint(
            1, REL_CLASSES + 1, (b, S, NUM_REL)).astype(np.int64),
        "rel_lengths": rng.randint(1, NUM_REL + 1, (b, S)).astype(np.int64),
        "act_labels": rng.randint(
            1, ACT_CLASSES + 1, (b, S, NUM_ACT)).astype(np.int64),
        "act_lengths": rng.randint(1, NUM_ACT + 1, (b, S)).astype(np.int64),
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
    batch["segment_ids"] = np.zeros((b, MAX_LEN), np.int64)
    return batch


def _ref_loss(torch, matcher, model_out, batch, empty_w_rel, empty_w_act):
    """agqaHGQA.py:344-378 loss composition, per-frame mode."""
    import torch.nn.functional as F

    logit, rel_logit, act_logit, hg_logit, _ = model_out
    target = torch.tensor(batch["target"])
    bce = torch.nn.BCEWithLogitsLoss()
    total = bce(hg_logit, target) * hg_logit.size(1)

    def set_loss(logits, labels, lengths, empty_weight, n_slot):
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

    total = total + set_loss(rel_logit, batch["rel_labels"],
                             batch["rel_lengths"], empty_w_rel, NUM_REL)
    total = total + set_loss(act_logit, batch["act_labels"],
                             batch["act_lengths"], empty_w_act, NUM_ACT)
    return total


def _transplant(sd, params):
    """Reference AGQAModel state_dict -> our ShgVqaModel param tree."""
    from tests.test_reference_parity_full import (
        _bert_layer,
        _cross_layer,
        _dense,
        _ln,
    )

    pp = {k: v for k, v in params.items()}  # shallow; subtrees replaced

    bert = "lxrt_encoder.model.bert"
    lxrt = {
        "embeddings": {
            "word_embeddings": {
                "embedding": sd[f"{bert}.embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd[
                    f"{bert}.embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {
                "embedding": sd[
                    f"{bert}.embeddings.token_type_embeddings.weight"]},
            "ln": _ln(sd, f"{bert}.embeddings.LayerNorm"),
        },
    }
    enc = {}
    n_vis = VT * VHW * VHW + 1
    enc["visual_tokenizer"] = {
        "conv1": {"kernel": sd[f"{bert}.encoder.visn_fc.conv.1.weight"]
                  .transpose(2, 3, 4, 1, 0),
                  "bias": sd[f"{bert}.encoder.visn_fc.conv.1.bias"]},
        "conv2": {"kernel": sd[f"{bert}.encoder.visn_fc.conv.4.weight"]
                  .transpose(2, 3, 4, 1, 0),
                  "bias": sd[f"{bert}.encoder.visn_fc.conv.4.bias"]},
        "cls_token": sd[f"{bert}.encoder.visn_fc.cls_token"],
        "pos_embedding": sd[
            f"{bert}.encoder.visn_fc.position_encoding.pe.weight"][:n_vis],
    }
    for i in range(L):
        enc[f"l_{i}"] = _bert_layer(sd, f"{bert}.encoder.layer.{i}")
    for i in range(R):
        enc[f"r_{i}"] = _bert_layer(sd, f"{bert}.encoder.r_layers.{i}")
    enc["x_tied"] = _cross_layer(sd, f"{bert}.encoder.x_layers.0")
    lxrt["encoder"] = enc
    lxrt["pooler"] = {"dense2": _dense(sd, f"{bert}.pooler_dict.cross.dense2")}
    pp["lxrt"] = lxrt

    pp["hgq_encoder"] = {
        "x_tied": _cross_layer(sd, "hgq_encoder.cross_attn_layer.cross"),
        "act_token": sd["hgq_encoder.act_token"],
        "rel_token": sd["hgq_encoder.rel_token"],
        "cls_token": sd["hgq_encoder.cls_token"],
        "pooler": {"dense2": _dense(sd, "hgq_encoder.pooler_dict.cross.dense2")},
    }

    for ours, ref in (("relation_query_embed", "relation_query_embed"),
                      ("action_query_embed", "action_query_embed")):
        pp[ours] = {
            "word_embeddings": {
                "embedding": sd[f"{ref}.word_embeddings.weight"]},
            "token_type_embeddings": {
                "embedding": sd[f"{ref}.token_type_embeddings.weight"]},
            "ln": _ln(sd, f"{ref}.LayerNorm"),
        }

    def decoder_layer(prefix):
        return {
            "self_attn": {
                "in_proj": {"kernel": sd[f"{prefix}.self_attn.in_proj_weight"].T,
                            "bias": sd[f"{prefix}.self_attn.in_proj_bias"]},
                "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
            },
            "multihead_attn": {
                "in_proj": {
                    "kernel": sd[f"{prefix}.multihead_attn.in_proj_weight"].T,
                    "bias": sd[f"{prefix}.multihead_attn.in_proj_bias"]},
                "out_proj": _dense(sd, f"{prefix}.multihead_attn.out_proj"),
            },
            "linear1": _dense(sd, f"{prefix}.linear1"),
            "linear2": _dense(sd, f"{prefix}.linear2"),
            "norm1": _ln(sd, f"{prefix}.norm1"),
            "norm2": _ln(sd, f"{prefix}.norm2"),
            "norm3": _ln(sd, f"{prefix}.norm3"),
        }

    for ours, ref in (("rel_decoder", "rel_decoder"),
                      ("action_decoder", "action_decoder")):
        pp[ours] = {f"layer_{i}": decoder_layer(f"{ref}.layers.{i}")
                    for i in range(DLAYERS)}

    def mlp_head(prefix):
        return {"fc1": _dense(sd, f"{prefix}.0"),
                "ln": _ln(sd, f"{prefix}.2"),
                "fc2": _dense(sd, f"{prefix}.3")}

    pp["class_embed"] = mlp_head("class_embed")
    pp["action_embed"] = mlp_head("action_embed")
    pp["logit_fc"] = mlp_head("logit_fc")
    return pp


def _our_cfg():
    import dataclasses

    from shgvqa_tpu.configs.config import tiny_test_config

    cfg = tiny_test_config(task="hgqa")
    enc = dataclasses.replace(
        cfg.encoder, vocab_size=VOCAB, hidden_size=D, num_heads=HEADS,
        intermediate_size=FFN, hidden_dropout=0.0, attention_dropout=0.0,
        max_position_embeddings=64, type_vocab_size=2,
        l_layers=L, x_layers=X, r_layers=R, cross_attn_type="cross",
        tie_x_layers=True, visual_feat_dim=VFEAT, visual_t=VT,
        visual_hw=VHW)
    dec = dataclasses.replace(
        cfg.decoder, num_layers=DLAYERS, num_heads=12, ffn_dim=2048,
        dropout=0.0, emb_dropout=0.0, linear_cls=False)
    data = dataclasses.replace(
        cfg.data, num_situations=S, num_rel=NUM_REL, num_act=NUM_ACT,
        max_seq_length=MAX_LEN, clip_len=S)
    cfg = cfg.replace(
        encoder=enc, decoder=dec, data=data, num_answers=NUM_ANSWERS,
        num_rel_classes=REL_CLASSES, num_act_classes=ACT_CLASSES,
        eos_coef=0.1, loss_hg_per_frame=True, use_hg_mask=True,
        gt_hg=False, compute_dtype="float32")
    cfg.validate()
    return cfg


def _ref_forward(torch, model, batch):
    from src.lxrt.entry import generate_rel_target_mask

    from shgvqa_tpu.data.featurize import hg_segment_ids

    return model(
        torch.tensor(batch["feats"]), torch.tensor(batch["boxes"]),
        input_ids=torch.tensor(batch["input_ids"]),
        input_masks=torch.tensor(batch["input_mask"]),
        segment_ids=torch.tensor(batch["segment_ids"]),
        rel_segment_ids=torch.tensor(
            hg_segment_ids(S, NUM_REL)[None].repeat(
                batch["feats"].shape[0], 0).astype(np.int64)),
        rel_tgt_mask=torch.tensor(np.asarray(
            generate_rel_target_mask(S, NUM_REL), np.float32)),
        act_segment_ids=torch.tensor(
            hg_segment_ids(S, NUM_ACT)[None].repeat(
                batch["feats"].shape[0], 0).astype(np.int64)),
        act_tgt_mask=torch.tensor(np.asarray(
            generate_rel_target_mask(S, NUM_ACT), np.float32)),
        hg_mask=torch.tensor(batch["hg_mask"]),
    )


def _our_batch(batch):
    return {
        "input_ids": batch["input_ids"].astype(np.int32),
        "input_mask": batch["input_mask"].astype(np.int32),
        "segment_ids": batch["segment_ids"].astype(np.int32),
        "visual_feats": batch["feats"].transpose(0, 2, 3, 4, 1),
        "visual_mask": batch["boxes"].astype(np.int32),
        "hg_mask": batch["hg_mask"].astype(np.int32),
        "rel_labels": batch["rel_labels"].astype(np.int32),
        "rel_lengths": batch["rel_lengths"].astype(np.int32),
        "act_labels": batch["act_labels"].astype(np.int32),
        "act_lengths": batch["act_lengths"].astype(np.int32),
        "target": batch["target"],
    }


def test_full_model_train_trajectory_parity(ref_setup):
    import jax
    import jax.numpy as jnp
    import optax

    from src.lxrt.matcher import HungarianMatcher
    from src.lxrt.optimization import BertAdam

    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses

    torch, mc, am, args, ref_model = ref_setup
    cfg = _our_cfg()
    ours = ShgVqaModel(cfg)

    rng = np.random.RandomState(0)
    batches = [_make_batch(np.random.RandomState(100 + i))
               for i in range(STEPS)]

    our_b0 = _our_batch(batches[0])
    params = jax.device_get(ours.init(
        jax.random.PRNGKey(0), our_b0, deterministic=True))
    sd = {k: np.array(v.detach().numpy(), copy=True) for k, v in
          ref_model.state_dict().items()}
    params = {"params": _transplant(sd, params["params"])}
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # ---- forward parity at step 0 -------------------------------------
    ref_model.eval()
    with torch.no_grad():
        ref_out0 = _ref_forward(torch, ref_model, batches[0])
    out0 = ours.apply(params, our_b0, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out0["logit"]), ref_out0[0].numpy(),
        rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out0["rel_preds"]), ref_out0[1].numpy(),
        rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out0["act_preds"]), ref_out0[2].numpy(),
        rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out0["hg_logit"]), ref_out0[3].numpy(),
        rtol=5e-4, atol=5e-4)


    # ---- train both sides for STEPS with identical batches ------------
    ref_model.train()
    matcher = HungarianMatcher(cost_class=1, loss_hg_per_frame=True,
                               clip_len=S)
    empty_w_rel = torch.ones(REL_CLASSES + 1)
    empty_w_rel[0] = 0.1
    empty_w_act = torch.ones(ACT_CLASSES + 1)
    empty_w_act[0] = 0.1
    optim = BertAdam(list(ref_model.parameters()), lr=LR, warmup=0.1,
                     t_total=STEPS)

    ref_losses = []
    for b in batches:
        optim.zero_grad()
        out = _ref_forward(torch, ref_model, b)
        total = _ref_loss(torch, matcher, out, b, empty_w_rel, empty_w_act)
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 5.0)
        optim.step()
        ref_losses.append(float(total.detach()))

    tx = make_optimizer(lr=LR, t_total=STEPS, warmup=0.1, flat=False)
    opt_state = tx.init(params)

    def loss_fn(p, b):
        out = ours.apply(p, b, deterministic=True)
        total, metrics = compute_losses(cfg, out, b)
        return total, metrics

    @jax.jit
    def step(p, o, b):
        (total, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, b)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, total, metrics

    our_losses = []
    for b in batches:
        params, opt_state, total, metrics = step(
            params, opt_state, _our_batch(b))
        our_losses.append(float(total))

    # both sides clip at global-norm 5.0: the clip SCALE is a single
    # f32 scalar multiplying every update, so rounding differences
    # amplify ~10x per step (plus discrete Hungarian assignment flips
    # under near-tied costs); 5e-3 relative over 4 steps at lr 1e-3 is
    # the f32 identity envelope
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=5e-3)

    # ---- post-training parameter agreement ----------------------------
    post = {k: np.array(v.detach().numpy(), copy=True)
            for k, v in ref_model.state_dict().items()}
    p_np = jax.device_get(params)["params"]
    checks = [
        (p_np["lxrt"]["embeddings"]["word_embeddings"]["embedding"],
         post["lxrt_encoder.model.bert.embeddings.word_embeddings.weight"]),
        (p_np["logit_fc"]["fc2"]["Dense_0"]["kernel"],
         post["logit_fc.3.weight"].T),
        (p_np["class_embed"]["fc1"]["Dense_0"]["kernel"],
         post["class_embed.0.weight"].T),
        (p_np["rel_decoder"]["layer_0"]["self_attn"]["in_proj"]["kernel"],
         post["rel_decoder.layers.0.self_attn.in_proj_weight"].T),
        (p_np["relation_query_embed"]["word_embeddings"]["embedding"],
         post["relation_query_embed.word_embeddings.weight"]),
    ]
    # per-element absolute envelope: total update magnitude over 4 steps
    # is O(lr * steps) = 4e-3, and the clip-scale amplification (above)
    # perturbs a handful of near-zero elements at that scale
    for ours_t, ref_t in checks:
        np.testing.assert_allclose(np.asarray(ours_t), ref_t, atol=6e-3)


def _fresh_ref_model(torch, mc, am):
    """Rebuild the tiny reference AGQAModel exactly as ref_setup does, so
    the learning race below is independent of test order (the trajectory
    test above trains the fixture's model in place)."""
    torch.manual_seed(0)
    model = am.AGQAModel(
        num_answers=NUM_ANSWERS, num_queries=S * NUM_REL,
        num_classes=REL_CLASSES, num_actions=ACT_CLASSES)
    torch.manual_seed(33)
    model.lxrt_encoder.model.bert.encoder.visn_fc.conv[1] = torch.nn.Conv3d(
        VFEAT, D, (5, 3, 3))
    model.lxrt_encoder.model.bert.encoder.visn_fc.conv[4] = torch.nn.Conv3d(
        D, D, (5, 3, 3))
    pe = model.lxrt_encoder.model.bert.encoder.visn_fc.position_encoding
    pe.pe = torch.nn.Embedding(VT * VHW * VHW + 1, D)
    model.relation_query_embed.dropout.p = 0.0
    model.train()
    return model


@pytest.mark.slow
def test_full_model_learning_race(ref_setup):
    """LONG-HORIZON learning parity: both frameworks train ~240 steps from
    the same transplanted init on the same fixed batch pool (a memorization
    task).  Exact trajectories diverge chaotically after O(10) f32 steps
    (grad-clip scale + Hungarian assignment flips amplify rounding), so the
    contract here is statistical: early steps track tightly, and the two
    loss curves stay within a narrow band all the way down — the strongest
    offline substitute for a real-data accuracy-parity run (VERDICT item 8,
    BASELINE.md acceptance row) while the dataset blobs remain unavailable
    upstream.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from src.lxrt.matcher import HungarianMatcher
    from src.lxrt.optimization import BertAdam

    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses

    torch, mc, am, args, _ = ref_setup
    ref_model = _fresh_ref_model(torch, mc, am)
    cfg = _our_cfg()
    ours = ShgVqaModel(cfg)

    n_steps, lr = 240, 1e-3
    pool = [_make_batch(np.random.RandomState(500 + i)) for i in range(8)]
    batches = [pool[i % len(pool)] for i in range(n_steps)]

    our_b0 = _our_batch(batches[0])
    params = jax.device_get(ours.init(
        jax.random.PRNGKey(0), our_b0, deterministic=True))
    sd = {k: np.array(v.detach().numpy(), copy=True) for k, v in
          ref_model.state_dict().items()}
    params = {"params": _transplant(sd, params["params"])}
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # ---- reference side ------------------------------------------------
    matcher = HungarianMatcher(cost_class=1, loss_hg_per_frame=True,
                               clip_len=S)
    empty_w_rel = torch.ones(REL_CLASSES + 1)
    empty_w_rel[0] = 0.1
    empty_w_act = torch.ones(ACT_CLASSES + 1)
    empty_w_act[0] = 0.1
    optim = BertAdam(list(ref_model.parameters()), lr=lr, warmup=0.1,
                     t_total=n_steps)
    ref_losses = []
    for b in batches:
        optim.zero_grad()
        out = _ref_forward(torch, ref_model, b)
        total = _ref_loss(torch, matcher, out, b, empty_w_rel, empty_w_act)
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 5.0)
        optim.step()
        ref_losses.append(float(total.detach()))

    # ---- our side ------------------------------------------------------
    tx = make_optimizer(lr=lr, t_total=n_steps, warmup=0.1, flat=False)
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
        params, opt_state, total = step(params, opt_state, _our_batch(b))
        our_losses.append(float(total))

    ref = np.asarray(ref_losses)
    our = np.asarray(our_losses)

    # 1) early steps: the exact-trajectory regime
    np.testing.assert_allclose(our[:6], ref[:6], rtol=2e-2, atol=2e-2)

    # 2) both sides learn: final plateau well below the initial loss
    init = ref[:5].mean()
    ref_final, our_final = ref[-20:].mean(), our[-20:].mean()
    assert ref_final < 0.55 * init, (ref_final, init)
    assert our_final < 0.55 * init, (our_final, init)

    # 3) the curves track: windowed means within 20% everywhere, and the
    # final plateaus within 15% of each other
    for lo in range(0, n_steps, 40):
        rw, ow = ref[lo:lo + 40].mean(), our[lo:lo + 40].mean()
        assert abs(ow - rw) / rw < 0.20, (lo, rw, ow)
    assert abs(our_final - ref_final) / ref_final < 0.15, (
        ref_final, our_final)

    out_path = os.environ.get("SHGVQA_RACE_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"ref": ref_losses, "ours": our_losses,
                       "steps": n_steps, "lr": lr}, f)
