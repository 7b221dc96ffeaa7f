"""End-to-end proof of the MViT-B weight converter.

pytorchvideo is not installed and there is no network, so the test rebuilds
the ``MultiscaleVisionTransformers`` state_dict topology and key naming at
toy dims (``patch_embed.patch_model``, ``cls_positional_encoding.*``,
``blocks.{i}.attn.{qkv,proj,pool_q,norm_q,...}`` -- the layout
``tools/convert_mvit.py`` maps), randomizes the weights, runs the
converter, and asserts our flax MViTB reproduces the torch features.
Covers the fused-qkv layout AND the separate-q/k/v fallback.  Reference
build site: ``video_encoder.py:97-103`` (hub ``mvit_base_32x3``).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from shgvqa_tpu.models.mvit import mvit_schedule  # noqa: E402

# toy dims, real topology
EMBED = 8
DEPTH = 4
HEADS0 = 1
STAGES = (1, 3)
KV0 = (1, 4, 4)
SCHEDULE = mvit_schedule(DEPTH, EMBED, HEADS0, STAGES, KV0)
EPS = 1e-6


def _pool(x, conv, norm, thw, B, h):
    """(B, h, 1+THW, hd) -> pooled, new thw (cls bypasses; LN after)."""
    if conv is None:
        return x, thw
    t, hh, ww = thw
    hd = x.shape[-1]
    cls_tok, grid = x[:, :, :1], x[:, :, 1:]
    grid = grid.reshape(B * h, t, hh, ww, hd).permute(0, 4, 1, 2, 3)
    grid = conv(grid)
    nt, nh, nw = grid.shape[2:]
    grid = grid.permute(0, 2, 3, 4, 1).reshape(B, h, nt * nh * nw, hd)
    out = torch.cat([cls_tok, grid], dim=2)
    return norm(out), (nt, nh, nw)


class _Attn(nn.Module):
    def __init__(self, dim, heads, q_stride, kv_stride, separate_qkv=False):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.separate_qkv = separate_qkv
        if separate_qkv:
            self.q = nn.Linear(dim, dim)
            self.k = nn.Linear(dim, dim)
            self.v = nn.Linear(dim, dim)
        else:
            self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.q_stride = q_stride
        if max(q_stride) > 1:
            self.pool_q = nn.Conv3d(self.hd, self.hd, 3, stride=q_stride,
                                    padding=1, groups=self.hd, bias=False)
            self.norm_q = nn.LayerNorm(self.hd, eps=EPS)
        else:
            self.pool_q = None
            self.norm_q = None
        self.pool_k = nn.Conv3d(self.hd, self.hd, 3, stride=kv_stride,
                                padding=1, groups=self.hd, bias=False)
        self.norm_k = nn.LayerNorm(self.hd, eps=EPS)
        self.pool_v = nn.Conv3d(self.hd, self.hd, 3, stride=kv_stride,
                                padding=1, groups=self.hd, bias=False)
        self.norm_v = nn.LayerNorm(self.hd, eps=EPS)

    def forward(self, x, thw):
        B, N, d = x.shape
        h, hd = self.heads, self.hd
        if self.separate_qkv:
            q = self.q(x).reshape(B, N, h, hd).permute(0, 2, 1, 3)
            k = self.k(x).reshape(B, N, h, hd).permute(0, 2, 1, 3)
            v = self.v(x).reshape(B, N, h, hd).permute(0, 2, 1, 3)
        else:
            qkv = self.qkv(x).reshape(B, N, 3, h, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
        q, q_thw = _pool(q, self.pool_q, self.norm_q, thw, B, h)
        k, _ = _pool(k, self.pool_k, self.norm_k, thw, B, h)
        v, _ = _pool(v, self.pool_v, self.norm_v, thw, B, h)
        attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
        out = attn.softmax(dim=-1) @ v
        out = out.transpose(1, 2).reshape(B, -1, d)
        return self.proj(out), q_thw


class _Block(nn.Module):
    def __init__(self, dim, dim_out, heads, q_stride, kv_stride,
                 separate_qkv=False):
        super().__init__()
        self.dim, self.dim_out = dim, dim_out
        self.norm1 = nn.LayerNorm(dim, eps=EPS)
        self.attn = _Attn(dim, heads, q_stride, kv_stride, separate_qkv)
        self.norm2 = nn.LayerNorm(dim, eps=EPS)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim_out)
        if dim != dim_out:
            self.proj = nn.Linear(dim, dim_out)
        self.q_stride = q_stride
        if max(q_stride) > 1:
            win = tuple(s + 1 if s > 1 else s for s in q_stride)
            self.pool_skip = nn.MaxPool3d(
                win, stride=q_stride, padding=tuple(w // 2 for w in win))
        else:
            self.pool_skip = None

    def forward(self, x, thw):
        h, new_thw = self.attn(self.norm1(x), thw)
        if self.pool_skip is not None:
            B, _, d = x.shape
            t, hh, ww = thw
            cls_tok, grid = x[:, :1], x[:, 1:]
            grid = grid.reshape(B, t, hh, ww, d).permute(0, 4, 1, 2, 3)
            grid = self.pool_skip(grid)
            grid = grid.permute(0, 2, 3, 4, 1).reshape(B, -1, d)
            res = torch.cat([cls_tok, grid], dim=1)
        else:
            res = x
        x = res + h
        xn = self.norm2(x)
        m = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(xn)))
        if self.dim != self.dim_out:
            x = self.proj(xn)
        return x + m, new_thw


class _PatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_model = nn.Conv3d(3, EMBED, (3, 7, 7), stride=(2, 4, 4),
                                     padding=(1, 3, 3))


class _ClsPos(nn.Module):
    def __init__(self, t, hw):
        super().__init__()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, EMBED))
        self.pos_embed_spatial = nn.Parameter(torch.zeros(1, hw, EMBED))
        self.pos_embed_temporal = nn.Parameter(torch.zeros(1, t, EMBED))
        self.pos_embed_class = nn.Parameter(torch.zeros(1, 1, EMBED))


class _ToyMViT(nn.Module):
    def __init__(self, t, hw, separate_qkv=False):
        super().__init__()
        self.patch_embed = _PatchEmbed()
        self.cls_positional_encoding = _ClsPos(t, hw)
        self.blocks = nn.ModuleList([
            _Block(dim, dim_out, heads, qs, kv, separate_qkv)
            for dim, dim_out, heads, qs, kv in SCHEDULE])
        self.norm_embed = nn.LayerNorm(SCHEDULE[-1][1], eps=EPS)

    def forward(self, x):
        x = self.patch_embed.patch_model(x)          # (B, C, T, H, W)
        B, C, t, hh, ww = x.shape
        thw = (t, hh, ww)
        x = x.flatten(2).transpose(1, 2)             # (B, THW, C)
        cp = self.cls_positional_encoding
        pos = (cp.pos_embed_spatial.repeat(1, t, 1) +
               torch.repeat_interleave(cp.pos_embed_temporal, hh * ww,
                                       dim=1))
        x = x + pos
        cls_tok = (cp.cls_token + cp.pos_embed_class).expand(B, -1, -1)
        x = torch.cat([cls_tok, x], dim=1)
        for blk in self.blocks:
            x, thw = blk(x, thw)
        x = self.norm_embed(x)
        t, hh, ww = thw
        return x[:, 1:].reshape(B, t, hh, ww, -1)


def _make_torch(separate_qkv):
    torch.manual_seed(0)
    m = _ToyMViT(t=4, hw=64, separate_qkv=separate_qkv)
    with torch.no_grad():
        for p in m.parameters():
            p.uniform_(-0.2, 0.2)
    return m.eval()


def _run_pair(separate_qkv):
    import jax.numpy as jnp

    from convert_mvit import convert
    from shgvqa_tpu.models.mvit import MViTB

    tm = _make_torch(separate_qkv)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree = convert(sd, [row[2] for row in SCHEDULE])

    rng = np.random.RandomState(1)
    frames = rng.randn(2, 3, 8, 32, 32).astype(np.float32)  # (B,C,T,H,W)
    with torch.no_grad():
        ref = tm(torch.from_numpy(frames)).numpy()           # NTHWC

    model = MViTB(embed_dim=EMBED, depth=DEPTH, num_heads=HEADS0,
                  stage_blocks=STAGES, kv_stride=KV0)
    ours = np.asarray(model.apply(
        {"params": tree["params"]},
        jnp.asarray(frames.transpose(0, 2, 3, 4, 1))))
    return sd, tree, ours, ref


def test_converted_features_match_torch_fused_qkv():
    sd, tree, ours, ref = _run_pair(separate_qkv=False)
    assert ours.shape == ref.shape == (2, 4, 2, 2, 32)
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)

    def count(node):
        if isinstance(node, dict):
            return sum(count(v) for v in node.values())
        return 1

    # every torch tensor lands in the tree (no silent drops)
    assert count(tree["params"]) == len(sd)


def test_converted_features_match_torch_separate_qkv():
    _, _, ours, ref = _run_pair(separate_qkv=True)
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)


def test_msgpack_roundtrip(tmp_path):
    from flax.serialization import msgpack_restore, msgpack_serialize

    _, tree, _, _ = _run_pair(separate_qkv=False)
    path = tmp_path / "mvit_flax.msgpack"
    path.write_bytes(msgpack_serialize(tree))
    back = msgpack_restore(path.read_bytes())
    np.testing.assert_array_equal(
        back["params"]["block_1"]["attn"]["pool_q"],
        tree["params"]["block_1"]["attn"]["pool_q"])
