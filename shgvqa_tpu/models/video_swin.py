"""Video Swin Transformer backbone (Liu et al., 2022) — Swin-B trunk.

The reference registers 'video_swin' but raises NotImplementedError
(``video_encoder.py:92-95``).  This is a ground-up flax implementation that
goes BEYOND the reference: the official SwinTransformer3D (Video-Swin /
mmaction ``swin_base_patch244_window877``) trunk, weight-compatible via
``tools/convert_video_swin.py``.  ``make_backbone('video_swin')`` still
raises by default for reference parity; ``make_backbone('video_swin',
implemented=True)`` / ``--backbone video_swin_impl`` selects this model.

Official topology reproduced exactly:
- patch embed: conv(2,4,4)/stride(2,4,4) -> C=128, LayerNorm.
- 4 stages, depths (2,2,18,2), heads (4,8,16,32); PatchMerging (2x2
  spatial concat -> LN -> Linear(4C, 2C, bias-free)) after stages 0-2.
- blocks: window attention (window (8,7,7), cyclic shift (4,3,3) on odd
  blocks) with 3D relative position bias and boundary masks, then
  LN -> MLP(fc1 4x, GELU, fc2); pre-norm residuals.
- per-block window/shift adjustment: any dim where the feature map is
  <= the window gets window=dim, shift=0 (official get_window_size).
- final LayerNorm.  (B, T, H, W, 3) -> (B, T/2, H/32, W/32, 8C).

TPU-first: window partition/reverse are pure static reshapes/transposes,
cyclic shifts are jnp.roll, relative-position indices and boundary masks
are precomputed with numpy at trace time (static shapes), everything
channels-last; the (nW, N, N) additive masks ride the standard additive-
mask softmax path XLA fuses well."""

from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@functools.lru_cache(maxsize=None)
def _rel_pos_index(wt: int, wh: int, ww: int) -> np.ndarray:
    """(N, N) int32 index into the (2wt-1)(2wh-1)(2ww-1) bias table —
    official SwinTransformer3D.get_position_index."""
    coords = np.stack(np.meshgrid(
        np.arange(wt), np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # (3, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wt - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= (2 * ww - 1)
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_mask(tp: int, hp: int, wp: int,
                window: Tuple[int, int, int],
                shift: Tuple[int, int, int]) -> np.ndarray:
    """(nW, N, N) additive mask (-100 across shifted-boundary regions) —
    official compute_mask."""
    wt, wh, ww = window
    st, sh, sw = shift
    img = np.zeros((tp, hp, wp))
    cnt = 0
    for t in (slice(-wt), slice(-wt, -st), slice(-st, None)) if st else \
            (slice(None),):
        for h in (slice(-wh), slice(-wh, -sh), slice(-sh, None)) if sh \
                else (slice(None),):
            for w in (slice(-ww), slice(-ww, -sw), slice(-sw, None)) if sw \
                    else (slice(None),):
                img[t, h, w] = cnt
                cnt += 1
    win = img.reshape(tp // wt, wt, hp // wh, wh, wp // ww, ww)
    win = win.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wt * wh * ww)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _adjust(size, window, shift):
    """Official get_window_size: clamp window to the input size, zero the
    shift in any clamped dim."""
    w = list(window)
    s = list(shift)
    for i in range(3):
        if size[i] <= window[i]:
            w[i] = size[i]
            s[i] = 0
    return tuple(w), tuple(s)


class WindowAttention3D(nn.Module):
    """Window MSA with 3D relative position bias."""

    num_heads: int
    window: Tuple[int, int, int]        # runtime (possibly clamped) window
    full_window: Tuple[int, int, int]   # construction window (table size)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        """x: (nB, N, C) windows; mask: (nW, N, N) additive or None."""
        nb, n, c = x.shape
        h = self.num_heads
        hd = c // h
        wt, wh, ww = self.full_window
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        qkv = qkv.reshape(nb, n, 3, h, hd)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]

        # table sized by the CONSTRUCTION window; when the runtime window
        # is clamped the official model slices the full index [:N, :N]
        # (SwinTransformer3D WindowAttention3D.forward) — reproduced here
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wt - 1) * (2 * wh - 1) * (2 * ww - 1), h))
        idx = jnp.asarray(_rel_pos_index(wt, wh, ww)[:n, :n])
        bias = table[idx.reshape(-1)].reshape(n, n, h)
        bias = bias.transpose(2, 0, 1).astype(jnp.float32)   # (h, N, N)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(hd) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            scores = scores.reshape(nb // nw, nw, h, n, n) + \
                mask[None, :, None]
            scores = scores.reshape(nb, h, n, n)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bqhd", probs, v).reshape(nb, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwinBlock3D(nn.Module):
    num_heads: int
    window: Tuple[int, int, int] = (8, 7, 7)
    shifted: bool = False
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, hh, ww_, c = x.shape
        window, shift = _adjust(
            (t, hh, ww_), self.window,
            tuple(w // 2 for w in self.window) if self.shifted
            else (0, 0, 0))
        wt, wh, ww = window
        pt = (wt - t % wt) % wt
        ph = (wh - hh % wh) % wh
        pw = (ww - ww_ % ww) % ww
        tp, hp, wp = t + pt, hh + ph, ww_ + pw

        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        if pt or ph or pw:
            h = jnp.pad(h, ((0, 0), (0, pt), (0, ph), (0, pw), (0, 0)))
        if any(shift):
            h = jnp.roll(h, (-shift[0], -shift[1], -shift[2]),
                         axis=(1, 2, 3))
            mask = jnp.asarray(_shift_mask(tp, hp, wp, window, shift))
        else:
            mask = None
        # window partition
        h = h.reshape(b, tp // wt, wt, hp // wh, wh, wp // ww, ww, c)
        h = h.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            -1, wt * wh * ww, c)
        h = WindowAttention3D(self.num_heads, window, self.window,
                              dtype=self.dtype, name="attn")(h, mask)
        # window reverse
        h = h.reshape(b, tp // wt, hp // wh, wp // ww, wt, wh, ww, c)
        h = h.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)
        if any(shift):
            h = jnp.roll(h, shift, axis=(1, 2, 3))
        if pt or ph or pw:
            h = h[:, :t, :hh, :ww_]
        x = shortcut + h

        m = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        m = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(m)
        m = jax.nn.gelu(m.astype(jnp.float32), approximate=False
                        ).astype(self.dtype)
        m = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(m)
        return x + m


class VideoSwin(nn.Module):
    """SwinTransformer3D trunk (swin_base_patch244_window877 dims)."""

    dtype: Dtype = jnp.float32
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    heads: Sequence[int] = (4, 8, 16, 32)
    window: Tuple[int, int, int] = (8, 7, 7)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(self.embed_dim, kernel_size=(2, 4, 4),
                    strides=(2, 4, 4), padding="VALID", dtype=dt,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                         name="patch_norm")(x)

        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = SwinBlock3D(
                    num_heads=self.heads[i], window=self.window,
                    shifted=j % 2 == 1, dtype=dt,
                    name=f"layer_{i}_block_{j}")(x)
            if i < len(self.depths) - 1:
                # PatchMerging: official 2x2 spatial concat order
                b, t, hh, ww, c = x.shape
                if hh % 2 or ww % 2:
                    x = jnp.pad(x, ((0, 0), (0, 0), (0, hh % 2),
                                    (0, ww % 2), (0, 0)))
                x0 = x[:, :, 0::2, 0::2]
                x1 = x[:, :, 1::2, 0::2]
                x2 = x[:, :, 0::2, 1::2]
                x3 = x[:, :, 1::2, 1::2]
                x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
                x = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                                 name=f"downsample_{i}_norm")(x)
                x = nn.Dense(2 * c, use_bias=False, dtype=dt,
                             param_dtype=jnp.float32,
                             name=f"downsample_{i}_reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                            name="norm")(x)
