"""Video Swin: parity vs a hand-built official SwinTransformer3D topology.

The reference NYIs 'video_swin' (``video_encoder.py:92-95``); our
``models/video_swin.VideoSwin`` implements the official Video-Swin trunk
(beyond-reference capability).  This test independently rebuilds the
official torch forward — window partition, cyclic shift + boundary masks,
3D relative position bias, PatchMerging — at toy dims with the official
state_dict naming, runs ``tools/convert_video_swin.py``, and asserts
feature parity.  Toy dims exercise: window clamping (stage dims <=
window), T-only shift, H/W padding, and both downsamples.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from shgvqa_tpu.models.video_swin import (  # noqa: E402
    VideoSwin, _rel_pos_index, _shift_mask)

EMBED = 8
DEPTHS = (1, 2, 1)
HEADS = (1, 2, 4)
WINDOW = (2, 2, 2)


def _get_window_size(size, window, shift):
    w, s = list(window), list(shift)
    for i in range(3):
        if size[i] <= window[i]:
            w[i] = size[i]
            s[i] = 0
    return tuple(w), tuple(s)


class _WindowAttn(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.window = window
        wt, wh, ww = window
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * wt - 1) * (2 * wh - 1) * (2 * ww - 1), heads))

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        h, hd = self.heads, self.hd
        qkv = self.qkv(x).reshape(B_, N, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        # official: full-window index sliced [:N, :N] when clamped
        idx = torch.from_numpy(
            _rel_pos_index(*WINDOW)[:N, :N].astype("int64"))
        bias = self.relative_position_bias_table[idx.reshape(-1)]
        bias = bias.reshape(N, N, h).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(B_ // nw, nw, h, N, N) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, h, N, N)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(out)


class _Block(nn.Module):
    def __init__(self, dim, heads, shifted):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn = _WindowAttn(dim, heads, WINDOW)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.shifted = shifted

    def forward(self, x):
        # x: (B, D, H, W, C)
        B, D, H, W, C = x.shape
        base_shift = tuple(w // 2 for w in WINDOW) if self.shifted \
            else (0, 0, 0)
        window, shift = _get_window_size((D, H, W), WINDOW, base_shift)
        self.attn.window = window
        wt, wh, ww = window
        shortcut = x
        x = self.norm1(x)
        pd = (wt - D % wt) % wt
        ph = (wh - H % wh) % wh
        pw = (ww - W % ww) % ww
        x = F.pad(x, (0, 0, 0, pw, 0, ph, 0, pd))
        Dp, Hp, Wp = D + pd, H + ph, W + pw
        if any(shift):
            x = torch.roll(x, (-shift[0], -shift[1], -shift[2]),
                           dims=(1, 2, 3))
            mask = torch.from_numpy(_shift_mask(Dp, Hp, Wp, window, shift))
        else:
            mask = None
        xw = x.view(B, Dp // wt, wt, Hp // wh, wh, Wp // ww, ww, C)
        xw = xw.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wt * wh * ww, C)
        aw = self.attn(xw, mask)
        aw = aw.view(B, Dp // wt, Hp // wh, Wp // ww, wt, wh, ww, C)
        x = aw.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, Dp, Hp, Wp, C)
        if any(shift):
            x = torch.roll(x, shift, dims=(1, 2, 3))
        x = x[:, :D, :H, :W]
        x = shortcut + x
        x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class _PatchMerge(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        B, D, H, W, C = x.shape
        if H % 2 or W % 2:
            x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], dim=-1)
        return self.reduction(self.norm(x))


class _Layer(nn.Module):
    def __init__(self, dim, depth, heads, downsample):
        super().__init__()
        self.blocks = nn.ModuleList(
            [_Block(dim, heads, shifted=j % 2 == 1) for j in range(depth)])
        self.downsample = _PatchMerge(dim) if downsample else None

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return x


class _PatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.proj = nn.Conv3d(3, EMBED, (2, 4, 4), stride=(2, 4, 4))
        self.norm = nn.LayerNorm(EMBED)


class _ToySwin(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = _PatchEmbed()
        dims = [EMBED * 2 ** i for i in range(len(DEPTHS))]
        self.layers = nn.ModuleList([
            _Layer(dims[i], DEPTHS[i], HEADS[i],
                   downsample=i < len(DEPTHS) - 1)
            for i in range(len(DEPTHS))])
        self.norm = nn.LayerNorm(dims[-1])

    def forward(self, x):
        # x: (B, C, D, H, W) like the official model
        x = self.patch_embed.proj(x)
        x = x.permute(0, 2, 3, 4, 1)           # -> (B, D, H, W, C)
        x = self.patch_embed.norm(x)
        for layer in self.layers:
            x = layer(x)
        return self.norm(x)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = _ToySwin()
    with torch.no_grad():
        for p in m.parameters():
            p.uniform_(-0.2, 0.2)
    return m.eval()


def test_converted_features_match_torch(torch_model):
    import jax.numpy as jnp

    from convert_video_swin import convert

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    tree = convert(sd)

    rng = np.random.RandomState(1)
    # H=12 -> H'=3 exercises window padding; T=8 -> D=4 exercises T-shift
    frames = rng.randn(2, 3, 8, 12, 16).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(frames)).numpy()

    model = VideoSwin(embed_dim=EMBED, depths=DEPTHS, heads=HEADS,
                      window=WINDOW)
    ours = np.asarray(model.apply(
        {"params": tree["params"]},
        jnp.asarray(frames.transpose(0, 2, 3, 4, 1))))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)

    def count(node):
        if isinstance(node, dict):
            return sum(count(v) for v in node.values())
        return 1

    assert count(tree["params"]) == len(sd)


def test_full_dims_geometry():
    import jax
    import jax.numpy as jnp

    m = VideoSwin(embed_dim=8, depths=(1, 1, 1, 1), heads=(1, 2, 4, 8))
    x = jnp.zeros((1, 8, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == (1, 4, 2, 2, 64)
