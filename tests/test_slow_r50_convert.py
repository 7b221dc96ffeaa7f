"""End-to-end proof of the slow_r50 weight converter.

pytorchvideo is not installed and torch.hub has no network here, so the test
builds a torch model with pytorchvideo's EXACT slow_r50 topology and
state_dict key naming (``blocks.0.conv/norm``, ``blocks.{s}.res_blocks.{i}.
branch1_conv/branch1_norm/branch2.conv_{a,b,c}/norm_{a,b,c}`` -- the layout
``tools/convert_slow_r50.py`` maps, same as the torch.hub SLOW_8x8_R50
checkpoint), randomizes weights AND BatchNorm running stats, runs the
converter, and asserts our flax SlowR50 reproduces the torch features on a
fixed clip.  With the real checkpoint the same command
(``python tools/convert_slow_r50.py SLOW_8x8_R50.pyth out.msgpack``) yields
the pretrained backbone; this test pins every mapping + layout convention it
relies on (reference build site: ``video_encoder.py:43-51``).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

# toy widths, real topology: depths (3,4,6,3), temporal kernels (1,1,3,3),
# spatial stride 2 at stage entry for res3..res5
STEM_W = 8
MIDS = (8, 16, 32, 64)
OUTS = (32, 64, 128, 256)
DEPTHS = (3, 4, 6, 3)
TKS = (1, 1, 3, 3)


class _Branch2(nn.Module):
    def __init__(self, cin, mid, out, tk, stride):
        super().__init__()
        self.conv_a = nn.Conv3d(cin, mid, (tk, 1, 1),
                                padding=(tk // 2, 0, 0), bias=False)
        self.norm_a = nn.BatchNorm3d(mid)
        self.conv_b = nn.Conv3d(mid, mid, (1, 3, 3),
                                stride=(1, stride, stride),
                                padding=(0, 1, 1), bias=False)
        self.norm_b = nn.BatchNorm3d(mid)
        self.conv_c = nn.Conv3d(mid, out, (1, 1, 1), bias=False)
        self.norm_c = nn.BatchNorm3d(out)

    def forward(self, x):
        x = torch.relu(self.norm_a(self.conv_a(x)))
        x = torch.relu(self.norm_b(self.conv_b(x)))
        return self.norm_c(self.conv_c(x))


class _ResBlock(nn.Module):
    def __init__(self, cin, mid, out, tk, stride):
        super().__init__()
        if cin != out or stride != 1:
            self.branch1_conv = nn.Conv3d(
                cin, out, (1, 1, 1), stride=(1, stride, stride), bias=False)
            self.branch1_norm = nn.BatchNorm3d(out)
        else:
            self.branch1_conv = None
        self.branch2 = _Branch2(cin, mid, out, tk, stride)

    def forward(self, x):
        shortcut = x if self.branch1_conv is None else \
            self.branch1_norm(self.branch1_conv(x))
        return torch.relu(shortcut + self.branch2(x))


class _Stage(nn.Module):
    def __init__(self, cin, mid, out, depth, tk, stride):
        super().__init__()
        blocks = []
        for i in range(depth):
            blocks.append(_ResBlock(cin if i == 0 else out, mid, out, tk,
                                    stride if i == 0 else 1))
        self.res_blocks = nn.ModuleList(blocks)

    def forward(self, x):
        for b in self.res_blocks:
            x = b(x)
        return x


class _Stem(nn.Module):
    def __init__(self, w):
        super().__init__()
        self.conv = nn.Conv3d(3, w, (1, 7, 7), stride=(1, 2, 2),
                              padding=(0, 3, 3), bias=False)
        self.norm = nn.BatchNorm3d(w)
        self.pool = nn.MaxPool3d((1, 3, 3), stride=(1, 2, 2),
                                 padding=(0, 1, 1))

    def forward(self, x):
        return self.pool(torch.relu(self.norm(self.conv(x))))


class _TorchSlowR50(nn.Module):
    """pytorchvideo Net layout: blocks.0 stem, blocks.1..4 stages (the real
    checkpoint also has a blocks.5 head, dropped by the converter)."""

    def __init__(self):
        super().__init__()
        blocks = [_Stem(STEM_W)]
        cin = STEM_W
        strides = (1, 2, 2, 2)
        for s in range(4):
            blocks.append(_Stage(cin, MIDS[s], OUTS[s], DEPTHS[s], TKS[s],
                                 strides[s]))
            cin = OUTS[s]
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(5)
    m = _TorchSlowR50()
    # nontrivial running stats so a stats-mapping bug cannot hide
    gen = np.random.RandomState(9)
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm3d):
            n = mod.running_mean.numel()
            mod.running_mean.copy_(
                torch.tensor(gen.randn(n).astype(np.float32) * 0.3))
            mod.running_var.copy_(torch.tensor(
                np.abs(gen.randn(n).astype(np.float32)) + 0.5))
    m.eval()
    return m


def test_converted_features_match_torch(torch_model):
    import jax.numpy as jnp

    from convert_slow_r50 import convert
    from shgvqa_tpu.models.backbone import SlowR50

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    tree = convert(sd)

    clip = np.random.RandomState(0).randn(2, 4, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.tensor(
            clip.transpose(0, 4, 1, 2, 3))).numpy()

    model = SlowR50(stem_width=STEM_W, mids=MIDS, outs=OUTS)
    ours = np.asarray(model.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(clip)))

    assert ours.shape == (2, 4, 2, 2, OUTS[-1])  # T preserved, H/32
    np.testing.assert_allclose(
        ours, ref.transpose(0, 2, 3, 4, 1), rtol=2e-4, atol=2e-4)


def test_msgpack_roundtrip_and_head_drop(torch_model, tmp_path):
    """The .pyth checkpoint wraps the weights in {'model_state': ...} and
    includes a blocks.5 classifier head; the converter path drops it and the
    msgpack round-trips losslessly."""
    from flax.serialization import msgpack_restore, msgpack_serialize

    from convert_slow_r50 import convert

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    sd["blocks.5.proj.weight"] = np.zeros((4, OUTS[-1]), np.float32)
    sd = {k: v for k, v in sd.items() if not k.startswith("blocks.5")}
    tree = convert(sd)
    blob = msgpack_serialize(tree)
    (tmp_path / "bb.msgpack").write_bytes(blob)
    back = msgpack_restore((tmp_path / "bb.msgpack").read_bytes())
    for a, b in zip(
            sorted(_leaves(tree)), sorted(_leaves(back))):
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])


def _leaves(tree, prefix=""):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out.extend(_leaves(v, prefix + k + "/"))
        else:
            out.append((prefix + k, np.asarray(v)))
    return out


def test_trainer_load_backbone_end_to_end(torch_model, tmp_path):
    """--backboneWeights wiring: converted msgpack lands in a video model's
    backbone subtree (params + batch_stats) and the model still runs."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from flax.serialization import msgpack_serialize

    from convert_slow_r50 import convert
    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.models import backbone as bb_mod
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel
    from shgvqa_tpu.train.loop import Trainer
    from tests.test_train_loop import _make_items

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    tree = convert(sd)
    path = tmp_path / "slow_r50_flax.msgpack"
    path.write_bytes(msgpack_serialize(tree))

    cfg = tiny_test_config(task="hgqa")
    cfg = cfg.replace(
        encoder=dataclasses.replace(cfg.encoder, visual_feat_dim=OUTS[-1]),
        data=dataclasses.replace(cfg.data, clip_len=cfg.encoder.visual_t + 8,
                                 image_size=64))

    orig = bb_mod.BACKBONES["slow_r50"]
    bb_mod.BACKBONES["slow_r50"] = lambda dtype: bb_mod.SlowR50(
        dtype=dtype, stem_width=STEM_W, mids=MIDS, outs=OUTS)
    try:
        trainer = Trainer(cfg, steps_per_epoch=1,
                          model=VideoShgVqaModel(cfg))
        items = _make_items(cfg, n=2)
        from shgvqa_tpu.data.pipeline import stack_items
        batch = stack_items(items)
        batch.pop("ques_id", None)
        batch.pop("visual_feats", None)
        batch["frames"] = np.zeros(
            (2, cfg.data.clip_len, 64, 64, 3), np.uint8)
        trainer.init_params(batch)
        trainer.load_backbone(str(path))
        p = jax.device_get(trainer.params)
        np.testing.assert_array_equal(
            np.asarray(p["params"]["backbone"]["stem_conv"]["kernel"]),
            tree["params"]["stem_conv"]["kernel"])
        np.testing.assert_array_equal(
            np.asarray(p["batch_stats"]["backbone"]["stem_bn"]["mean"]),
            tree["batch_stats"]["stem_bn"]["mean"])
        out = jax.jit(
            lambda pp, b: trainer.model.apply(pp, b, deterministic=True)
        )(trainer.params, batch)
        assert np.isfinite(np.asarray(out["hg_logit"], np.float32)).all()
    finally:
        bb_mod.BACKBONES["slow_r50"] = orig


def test_load_backbone_rejects_featureless_model():
    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.data.pipeline import stack_items
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.loop import Trainer
    from tests.test_train_loop import _make_items

    cfg = tiny_test_config(task="hgqa")
    trainer = Trainer(cfg, steps_per_epoch=1, model=ShgVqaModel(cfg))
    batch = stack_items(_make_items(cfg, n=2))
    batch.pop("ques_id", None)
    trainer.init_params(batch)
    with pytest.raises(ValueError, match="backbone"):
        trainer.load_backbone("/nonexistent.msgpack")
