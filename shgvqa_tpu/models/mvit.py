"""MViT-B video backbone (Multiscale Vision Transformers, Fan et al. 2021).

Registry parity with the reference's 'mvit_B' row: ``video_encoder.py:97-103``
loads torch.hub ``mvit_base_32x3`` (pytorchvideo
``create_multiscale_vision_transformers``) -- with its classification head
still attached and a "todo: debug for input" comment; the path was never
exercised by a published recipe.  Here the trunk is rebuilt faithfully so
``tools/convert_mvit.py`` can load the pretrained checkpoint, and the head
is dropped so the output is a feature map the conv tokenizer accepts
(documented divergence from the reference's broken head-attached build).

pytorchvideo/SlowFast MViT-B facts reproduced exactly:
- patch embed: conv(3,7,7)/stride(2,4,4)/pad(1,3,3) to 96 channels; tokens
  flattened with a prepended cls token.
- separable positional embeddings (sep_pos_embed): pos_embed_spatial
  (H*W, C) tiled over T plus pos_embed_temporal (T, C) repeated over H*W,
  plus pos_embed_class.
- 16 blocks; channel dim doubles in the block BEFORE each resolution
  stage (dim_mul at blocks 1, 3, 14 applied to the PREVIOUS block's
  output via its MLP fc2 + residual ``proj``), head count doubles AT the
  stage block (1, 3, 14), so head_dim stays 96 everywhere.
- pooling attention: per-head depthwise conv(3,3,3) pooling, bias-free,
  followed by LayerNorm(head_dim, eps 1e-6); Q pooled with stride (1,2,2)
  at blocks 1/3/14 only; K/V pooled at EVERY block with the adaptive
  stride schedule starting at (1,8,8) and divided by each Q stride as it
  occurs (so blocks 0:(1,8,8), 1-2:(1,4,4), 3-13:(1,2,2), 14-15:(1,1,1)).
  The cls token bypasses pooling; the post-pool LayerNorm covers it.
- attention residual path max-pools tokens (kernel (1,3,3), the cls token
  bypassing) at Q-stride blocks; attention output = softmax(q k^T /
  sqrt(head_dim)) v with NO residual-q add (that is MViTv2).
- MLP: fc1 (4x) -> exact erf GELU -> fc2 (which carries the dim change);
  LayerNorm eps 1e-6 throughout; final ``norm_embed``.

(B, 16, 224, 224, 3) -> (B, 8, 7, 7, 768); everything channels-last,
static shapes, heads folded into the batch for the pooling convs.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_LN_EPS = 1e-6


def _depthwise_pool(x: jnp.ndarray, kernel: jnp.ndarray,
                    stride: Tuple[int, int, int], dtype) -> jnp.ndarray:
    """Depthwise conv over a (B*, T, H, W, C) grid, padding k//2."""
    kt, kh, kw = kernel.shape[0], kernel.shape[1], kernel.shape[2]
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=stride,
        padding=((kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1],
    )


class PoolingAttention(nn.Module):
    """MultiScaleAttention: fused qkv, per-head depthwise conv pooling with
    post-pool LayerNorm, cls token bypassing the pooling."""

    num_heads: int
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)
    q_stride: Tuple[int, int, int] = (1, 1, 1)
    kv_stride: Tuple[int, int, int] = (1, 1, 1)
    # pytorchvideo creates pool_q/norm_q ONLY at Q-stride blocks, but
    # pool_k/v at EVERY block under the adaptive schedule (even stride 1)
    has_q_pool: bool = False
    has_kv_pool: bool = True
    dtype: Dtype = jnp.float32

    def _pool(self, x: jnp.ndarray, thw: Tuple[int, int, int],
              stride: Tuple[int, int, int], tag: str
              ) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
        """x: (B, H, 1+THW, hd) -> pooled tokens + new thw.  A pool conv
        exists whenever the block declares one for this path (even
        stride 1: pytorchvideo's adaptive-KV schedule keeps the conv)."""
        b, h, _, hd = x.shape
        t, hh, ww = thw
        kernel = self.param(
            f"pool_{tag}",
            nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal"),
            self.pool_kernel + (1, hd))
        cls_tok, grid = x[:, :, :1], x[:, :, 1:]
        grid = grid.reshape(b * h, t, hh, ww, hd)
        grid = _depthwise_pool(grid, kernel, stride, self.dtype)
        nt, nh, nw = grid.shape[1:4]
        grid = grid.reshape(b, h, nt * nh * nw, hd)
        out = jnp.concatenate([cls_tok, grid], axis=2)
        out = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           name=f"norm_{tag}")(out)
        return out, (nt, nh, nw)

    @nn.compact
    def __call__(self, x: jnp.ndarray, thw: Tuple[int, int, int]
                 ) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
        b, l, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = nn.DenseGeneral((3, h, hd), axis=-1, dtype=self.dtype,
                              param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        q_thw = thw
        if self.has_q_pool:
            q, q_thw = self._pool(q, thw, self.q_stride, "q")
        if self.has_kv_pool:
            k, _ = self._pool(k, thw, self.kv_stride, "k")
            v, _ = self._pool(v, thw, self.kv_stride, "v")

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, out.shape[2], d)
        out = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        return out, q_thw


class MViTBlock(nn.Module):
    """MultiScaleBlock: attention at ``dim``; the MLP fc2 carries the
    dim change; when dim != dim_out the residual is REPLACED by
    proj(norm2(x)) (SlowFast-repo MViT v1 semantics)."""

    num_heads: int
    out_dim: int
    mlp_ratio: float = 4.0
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)
    q_stride: Tuple[int, int, int] = (1, 1, 1)
    kv_stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, thw):
        d = x.shape[-1]
        attn_in = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                               param_dtype=jnp.float32, name="norm1")(x)
        attn_out, new_thw = PoolingAttention(
            self.num_heads, self.pool_kernel, self.q_stride, self.kv_stride,
            has_q_pool=max(self.q_stride) > 1, has_kv_pool=True,
            dtype=self.dtype, name="attn")(attn_in, thw)
        if max(self.q_stride) > 1:
            # skip-path max pool: kernel s+1 (odd), cls token bypasses
            b = x.shape[0]
            t, hh, ww = thw
            cls_tok, grid = x[:, :1], x[:, 1:]
            grid = grid.reshape(b, t, hh, ww, d)
            win = tuple(s + 1 if s > 1 else s for s in self.q_stride)
            pad = tuple((w // 2, w // 2) for w in win)
            grid = nn.max_pool(grid, window_shape=win,
                               strides=self.q_stride, padding=pad)
            res = jnp.concatenate(
                [cls_tok, grid.reshape(b, -1, d)], axis=1)
        else:
            res = x
        x = res + attn_out
        xn = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                          param_dtype=jnp.float32, name="norm2")(x)
        hmid = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                        param_dtype=jnp.float32, name="mlp_fc1")(xn)
        hmid = jax.nn.gelu(hmid, approximate=False)
        hmid = nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="mlp_fc2")(hmid)
        if self.out_dim != d:
            x = nn.Dense(self.out_dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name="proj")(xn)
        return x + hmid, new_thw


def mvit_schedule(depth: int, embed_dim: int, num_heads: int,
                  stage_blocks: Sequence[int],
                  kv_stride: Tuple[int, int, int]):
    """Per-block (dim, dim_out, heads, q_stride, kv_stride) following the
    SlowFast-repo schedule: dim doubles in the block BEFORE each stage
    block; heads double AT the stage block; adaptive KV stride divided by
    each Q stride as it occurs (same block included)."""
    stage = set(stage_blocks)
    rows = []
    dim, heads = embed_dim, num_heads
    kv = list(kv_stride)
    for i in range(depth):
        if i in stage:
            heads *= 2
            dim *= 2
        qs = (1, 2, 2) if i in stage else (1, 1, 1)
        kv = [max(s // q, 1) for s, q in zip(kv, qs)]
        dim_out = dim * 2 if (i + 1) in stage else dim
        rows.append((dim, dim_out, heads, qs, tuple(kv)))
    return rows


class MViTB(nn.Module):
    """MViT-B trunk (hub ``mvit_base_32x3`` minus head):
    (B, T, H, W, 3) -> (B, T/2, H/32, W/32, 8*embed_dim)."""

    dtype: Dtype = jnp.float32
    embed_dim: int = 96
    depth: int = 16
    num_heads: int = 1
    stage_blocks: Sequence[int] = (1, 3, 14)
    kv_stride: Tuple[int, int, int] = (1, 8, 8)
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(self.embed_dim, kernel_size=(3, 7, 7),
                    strides=(2, 4, 4), padding=((1, 1), (3, 3), (3, 3)),
                    dtype=dt, param_dtype=jnp.float32, name="patch_embed")(x)
        b, t, hh, ww, d = x.shape
        thw = (t, hh, ww)
        x = x.reshape(b, t * hh * ww, d)

        # separable positional embeddings + cls token
        init = nn.initializers.truncated_normal(0.02)
        pos_sp = self.param("pos_embed_spatial", init, (hh * ww, d))
        pos_tm = self.param("pos_embed_temporal", init, (t, d))
        pos_cls = self.param("pos_embed_class", init, (1, d))
        cls_tok = self.param("cls_token", nn.initializers.zeros, (1, d))
        pos = (jnp.tile(pos_sp, (t, 1)) +
               jnp.repeat(pos_tm, hh * ww, axis=0))
        x = x + pos[None].astype(dt)
        cls_col = (cls_tok + pos_cls).astype(dt)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_col[None], (b, 1, d)), x], axis=1)

        for i, (dim, dim_out, heads, qs, kv) in enumerate(mvit_schedule(
                self.depth, self.embed_dim, self.num_heads,
                self.stage_blocks, self.kv_stride)):
            x, thw = MViTBlock(
                num_heads=heads, out_dim=dim_out,
                pool_kernel=self.pool_kernel, q_stride=qs, kv_stride=kv,
                dtype=dt, name=f"block_{i}")(x, thw)
        x = nn.LayerNorm(epsilon=_LN_EPS, dtype=dt, param_dtype=jnp.float32,
                         name="norm_embed")(x)
        t, hh, ww = thw
        return x[:, 1:].reshape(b, t, hh, ww, x.shape[-1])
