"""End-to-end proof of the SlowFast weight converter.

pytorchvideo is not installed and there is no network, so the test rebuilds
pytorchvideo's EXACT ``create_slowfast`` state_dict topology and key naming
(``blocks.{b}.multipathway_blocks.{p}`` pathways, ``multipathway_fusion.
conv_fast_to_slow``, ``res_blocks.{i}.branch1_*/branch2.conv_{a,b,c}`` --
the layout ``tools/convert_slowfast.py`` maps), randomizes weights AND
BatchNorm running stats, runs the converter, and asserts our flax
SlowFastR50 reproduces the torch per-pathway features.  With the real
checkpoint the same command
(``python tools/convert_slowfast.py SLOWFAST_8x8_R50.pyth out.msgpack``)
yields the pretrained backbone (reference build site:
``video_encoder.py:55-79``).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

# toy widths, real topology
ALPHA = 4
BETA_INV = 8
FUSION_RATIO = 2
FUSION_K = 7
STEM_W = 16                       # fast stem = 16 // 8 = 2
DEPTHS = (2, 1, 1, 1)             # depth-2 stage exercises no-proj blocks
MIDS = (8, 16, 32, 64)            # slow; fast = // 8
OUTS = (32, 64, 128, 256)
SLOW_TK = (1, 1, 3, 3)


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
        self.conv_c = nn.Conv3d(mid, out, 1, bias=False)
        self.norm_c = nn.BatchNorm3d(out)

    def forward(self, x):
        h = torch.relu(self.norm_a(self.conv_a(x)))
        h = torch.relu(self.norm_b(self.conv_b(h)))
        return self.norm_c(self.conv_c(h))


class _ResBlock(nn.Module):
    def __init__(self, cin, mid, out, tk, stride):
        super().__init__()
        if cin != out or stride != 1:
            self.branch1_conv = nn.Conv3d(cin, out, 1,
                                          stride=(1, stride, stride),
                                          bias=False)
            self.branch1_norm = nn.BatchNorm3d(out)
        else:
            self.branch1_conv = None
        self.branch2 = _Branch2(cin, mid, out, tk, stride)

    def forward(self, x):
        identity = x
        if self.branch1_conv is not None:
            identity = self.branch1_norm(self.branch1_conv(x))
        return torch.relu(identity + self.branch2(x))


class _Stage(nn.Module):
    def __init__(self, cin, mid, out, tk, stride, depth):
        super().__init__()
        blocks = []
        for i in range(depth):
            blocks.append(_ResBlock(cin, mid, out, tk,
                                    stride if i == 0 else 1))
            cin = out
        self.res_blocks = nn.ModuleList(blocks)

    def forward(self, x):
        for b in self.res_blocks:
            x = b(x)
        return x


class _Stem(nn.Module):
    def __init__(self, cout, tk):
        super().__init__()
        self.conv = nn.Conv3d(3, cout, (tk, 7, 7), stride=(1, 2, 2),
                              padding=(tk // 2, 3, 3), bias=False)
        self.norm = nn.BatchNorm3d(cout)
        self.pool = nn.MaxPool3d((1, 3, 3), stride=(1, 2, 2),
                                 padding=(0, 1, 1))

    def forward(self, x):
        return self.pool(torch.relu(self.norm(self.conv(x))))


class _Fuse(nn.Module):
    """FuseFastToSlow: conv(7,1,1)/s(alpha,1,1)/p(3,0,0) + BN + ReLU,
    concat [slow, fused] on channels."""

    def __init__(self, fast_ch):
        super().__init__()
        self.conv_fast_to_slow = nn.Conv3d(
            fast_ch, fast_ch * FUSION_RATIO, (FUSION_K, 1, 1),
            stride=(ALPHA, 1, 1), padding=(FUSION_K // 2, 0, 0), bias=False)
        self.norm = nn.BatchNorm3d(fast_ch * FUSION_RATIO)

    def forward(self, x):
        slow, fast = x
        fused = torch.relu(self.norm(self.conv_fast_to_slow(fast)))
        return [torch.cat([slow, fused], dim=1), fast]


class _MPWF(nn.Module):
    def __init__(self, slow_mod, fast_mod, fusion):
        super().__init__()
        self.multipathway_blocks = nn.ModuleList([slow_mod, fast_mod])
        self.multipathway_fusion = fusion

    def forward(self, x):
        x = [m(xi) for m, xi in zip(self.multipathway_blocks, x)]
        if self.multipathway_fusion is not None:
            x = self.multipathway_fusion(x)
        return x


class _ToySlowFast(nn.Module):
    def __init__(self):
        super().__init__()
        fast_w = STEM_W // BETA_INV
        blocks = [_MPWF(_Stem(STEM_W, 1), _Stem(fast_w, 5), _Fuse(fast_w))]
        slow_in = STEM_W + fast_w * FUSION_RATIO
        fast_in = fast_w
        for s in range(4):
            stride = 1 if s == 0 else 2
            fast_out = OUTS[s] // BETA_INV
            fusion = _Fuse(fast_out) if s < 3 else None
            blocks.append(_MPWF(
                _Stage(slow_in, MIDS[s], OUTS[s], SLOW_TK[s], stride,
                       DEPTHS[s]),
                _Stage(fast_in, MIDS[s] // BETA_INV, fast_out, 3, stride,
                       DEPTHS[s]),
                fusion))
            slow_in = OUTS[s] + (fast_out * FUSION_RATIO if s < 3 else 0)
            fast_in = fast_out
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        # PackPathway equivalent: slow sees every ALPHA-th frame
        x = [x[:, :, ::ALPHA], x]
        for b in self.blocks:
            x = b(x)
        return x


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = _ToySlowFast()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm3d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
    return m.eval()


def _flax_model():
    import jax.numpy as jnp

    from shgvqa_tpu.models.backbones_extra import SlowFastR50

    return SlowFastR50(dtype=jnp.float32, alpha=ALPHA, beta_inv=BETA_INV,
                       fusion_ratio=FUSION_RATIO, fusion_kernel=FUSION_K,
                       depths=DEPTHS, stem_width=STEM_W, mids=MIDS,
                       outs=OUTS)


def _convert(torch_model):
    from convert_slowfast import convert

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()
          if "num_batches_tracked" not in k}
    return sd, convert(sd, depths=DEPTHS)


def test_converted_features_match_torch(torch_model):
    import jax.numpy as jnp

    _, tree = _convert(torch_model)

    rng = np.random.RandomState(1)
    frames = rng.randn(2, 3, 8, 32, 32).astype(np.float32)  # (B, C, T, H, W)
    with torch.no_grad():
        slow_ref, fast_ref = torch_model(torch.from_numpy(frames))
    slow_ref = slow_ref.numpy().transpose(0, 2, 3, 4, 1)     # -> NTHWC
    fast_ref = fast_ref.numpy().transpose(0, 2, 3, 4, 1)

    ours = np.asarray(_flax_model().apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(frames.transpose(0, 2, 3, 4, 1))))        # NTHWC in

    # our output contract: channel-concat at FAST rate, slow repeated alpha
    slow_ch = OUTS[-1]
    np.testing.assert_allclose(
        ours[..., :slow_ch],
        np.repeat(slow_ref, ALPHA, axis=1)[:, : fast_ref.shape[1]],
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours[..., slow_ch:], fast_ref,
                               rtol=2e-4, atol=2e-4)


def test_converter_covers_every_tensor(torch_model):
    """Every torch tensor lands somewhere in the tree (no silent drops)."""
    sd, tree = _convert(torch_model)

    def count(node):
        if isinstance(node, dict):
            return sum(count(v) for v in node.values())
        return 1

    assert count(tree["params"]) + count(tree["batch_stats"]) == len(sd)


def test_msgpack_roundtrip(torch_model, tmp_path):
    from flax.serialization import msgpack_restore, msgpack_serialize

    _, tree = _convert(torch_model)
    path = tmp_path / "slowfast_flax.msgpack"
    path.write_bytes(msgpack_serialize(tree))
    back = msgpack_restore(path.read_bytes())
    assert set(back.keys()) == {"params", "batch_stats"}
    np.testing.assert_array_equal(
        back["params"]["fuse_0_conv"]["kernel"],
        tree["params"]["fuse_0_conv"]["kernel"])
