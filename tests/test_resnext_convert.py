"""End-to-end proof of the ResNeXt-101 32x8d weight converter.

timm is not installed and there is no network, so the test rebuilds timm's
EXACT ResNet state_dict topology and key naming (``conv1/bn1``,
``layer{s}.{i}.conv{1,2,3}/bn{1,2,3}/downsample.0/.1`` — the layout
``tools/convert_resnext101.py`` maps, identical for timm and torchvision
``resnext101_32x8d``), randomizes weights AND BatchNorm running stats, runs
the converter, and asserts our flax ResNeXt101 reproduces the torch features
per frame.  With the real checkpoint the same command
(``python tools/convert_resnext101.py resnext101_32x8d.pth out.msgpack``)
yields the pretrained backbone (reference build site:
``video_encoder.py:82-93``).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

# toy widths, real topology
STEM_W = 8
GROUPS = 4
WIDTH_PER_GROUP = 2
DEPTHS = (2, 2, 2, 2)
OUTS = (16, 32, 64, 128)


class _Bottleneck(nn.Module):
    """torchvision/timm Bottleneck (v1.5: stride on the grouped 3x3)."""

    def __init__(self, cin, mid, out, stride, groups):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride=stride, padding=1,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or cin != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, out, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(h + identity)


class _ToyResNeXt(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, STEM_W, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(STEM_W)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = STEM_W
        for s in range(4):
            mid = GROUPS * WIDTH_PER_GROUP * (2 ** s)
            blocks = []
            for i in range(DEPTHS[s]):
                stride = 2 if (i == 0 and s > 0) else 1
                blocks.append(_Bottleneck(cin, mid, OUTS[s], stride, GROUPS))
                cin = OUTS[s]
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = _ToyResNeXt()
    # randomize BN running stats away from (0, 1) so the test catches
    # swapped/missing stats
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
    return m.eval()


def _flax_model():
    import jax.numpy as jnp

    from shgvqa_tpu.models.backbones_extra import ResNeXt101

    return ResNeXt101(dtype=jnp.float32, depths=DEPTHS, groups=GROUPS,
                      width_per_group=WIDTH_PER_GROUP, stem_width=STEM_W,
                      outs=OUTS)


def test_converted_features_match_torch(torch_model):
    import jax.numpy as jnp
    from convert_resnext101 import convert

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()
          if "num_batches_tracked" not in k}
    tree = convert(sd, depths=DEPTHS)

    rng = np.random.RandomState(1)
    frames = rng.randn(2, 3, 3, 64, 64).astype(np.float32)  # (B, T, C, H, W)
    with torch.no_grad():
        b, t = frames.shape[:2]
        ref = torch_model(torch.from_numpy(
            frames.reshape(b * t, 3, 64, 64)))
        ref = ref.reshape(b, t, *ref.shape[1:]).numpy()     # (B,T,C,H,W)

    ours = _flax_model().apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(frames.transpose(0, 1, 3, 4, 2)))        # NTHWC
    ours = np.asarray(ours).transpose(0, 1, 4, 2, 3)          # back to NTCHW

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_converter_covers_every_tensor(torch_model):
    """Every torch tensor lands somewhere in the tree (no silent drops)."""
    from convert_resnext101 import convert

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()
          if "num_batches_tracked" not in k}
    tree = convert(sd, depths=DEPTHS)

    def count(node):
        if isinstance(node, dict):
            return sum(count(v) for v in node.values())
        return 1

    assert count(tree["params"]) + count(tree["batch_stats"]) == len(sd)


def test_msgpack_roundtrip_loads_into_trainer_path(torch_model, tmp_path):
    """The emitted msgpack round-trips through flax serialization with the
    exact tree structure Trainer.load_backbone consumes."""
    from flax.serialization import msgpack_restore, msgpack_serialize

    from convert_resnext101 import convert

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()
          if "num_batches_tracked" not in k}
    tree = convert(sd, depths=DEPTHS)
    path = tmp_path / "resnext101_flax.msgpack"
    path.write_bytes(msgpack_serialize(tree))
    back = msgpack_restore(path.read_bytes())
    assert set(back.keys()) == {"params", "batch_stats"}
    np.testing.assert_array_equal(
        back["params"]["stem_conv"]["kernel"],
        tree["params"]["stem_conv"]["kernel"])
