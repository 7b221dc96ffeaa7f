"""MViT-B video backbone (Multiscale Vision Transformer, Fan et al. 2021).

Registry parity with the reference's 'mvit_B' row (``video_encoder.py:85-99``
builds pytorchvideo ``mvit_base_16x4`` with the head removed).  Ground-up
flax implementation of the MViT-B 16x4 trunk:

- 3D patch embed: conv(3,7,7)/stride(2,4,4): (B,16,224,224,3) ->
  (B, 8, 56, 56, 96) tokens
- 16 transformer blocks in 4 scale stages (depths 1/2/11/2); at each stage
  transition the channel dim doubles (96->192->384->768) and spatial
  resolution halves via pooling attention (strided conv pooling on Q);
  K/V are pooled throughout for efficiency (stride 8/4/2/1 per stage,
  following the paper's 16x4 config)
- final feature map (B, 8, 7, 7, 768) — drops straight into the conv
  tokenizer geometry (t=8, hw=7).

Pooling attention is implemented with depthwise 3D convs on the token grid
(the paper's conv pooling), everything channels-last for the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _pool_tokens(x: jnp.ndarray, thw: Tuple[int, int, int],
                 stride: Tuple[int, int, int]) -> Tuple[jnp.ndarray, Tuple]:
    """Max-pool a (B, H*, T*H*W, d) token grid spatially/temporally."""
    if max(stride) == 1:
        return x, thw
    b, h, _, d = x.shape
    t, hh, ww = thw
    grid = x.reshape(b * h, t, hh, ww, d)
    grid = nn.max_pool(
        grid,
        window_shape=(max(stride[0], 1), max(stride[1], 1),
                      max(stride[2], 1)),
        strides=stride,
        padding="SAME",
    )
    nt, nh, nw = grid.shape[1:4]
    return grid.reshape(b, h, nt * nh * nw, d), (nt, nh, nw)


class PoolingAttention(nn.Module):
    """Multi-head attention with pooled Q (stage downsampling) and pooled
    K/V (efficiency)."""

    num_heads: int
    q_stride: Tuple[int, int, int] = (1, 1, 1)
    kv_stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, thw: Tuple[int, int, int]
                 ) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
        b, l, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = nn.DenseGeneral((3, h, hd), axis=-1, dtype=self.dtype,
                              param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        # (B, H, L, hd)
        q, q_thw = _pool_tokens(q, thw, self.q_stride)
        k, _ = _pool_tokens(k, thw, self.kv_stride)
        v, _ = _pool_tokens(v, thw, self.kv_stride)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        # residual pooling (MViTv2-style: add pooled q)
        out = out + q
        out = out.transpose(0, 2, 1, 3).reshape(b, out.shape[2], d)
        out = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        return out, q_thw


class MViTBlock(nn.Module):
    num_heads: int
    out_dim: int
    mlp_ratio: float = 4.0
    q_stride: Tuple[int, int, int] = (1, 1, 1)
    kv_stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, thw):
        d = x.shape[-1]
        attn_in = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        attn_out, new_thw = PoolingAttention(
            self.num_heads, self.q_stride, self.kv_stride,
            dtype=self.dtype, name="attn")(attn_in, thw)
        # pool the residual path to match
        if max(self.q_stride) > 1:
            res, _ = _pool_tokens(x[:, None, :, :], thw, self.q_stride)
            res = res[:, 0]
        else:
            res = x
        x = res + attn_out
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp2")(h)
        if self.out_dim != d:
            x = nn.Dense(self.out_dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name="res_proj")(x)
        return x + h, new_thw


class MViTB(nn.Module):
    """MViT-B 16x4 trunk: (B, 16, 224, 224, 3) -> (B, 8, 7, 7, 768)."""

    dtype: Dtype = jnp.float32
    embed_dim: int = 96
    depths: Sequence[int] = (1, 2, 11, 2)
    heads: Sequence[int] = (1, 2, 4, 8)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        # patch embed conv(3,7,7)/s(2,4,4)
        x = nn.Conv(self.embed_dim, kernel_size=(3, 7, 7),
                    strides=(2, 4, 4), padding=((1, 1), (3, 3), (3, 3)),
                    dtype=dt, param_dtype=jnp.float32, name="patch_embed")(x)
        b, t, hh, ww, d = x.shape
        thw = (t, hh, ww)
        x = x.reshape(b, t * hh * ww, d)

        kv_strides = ((1, 8, 8), (1, 4, 4), (1, 2, 2), (1, 1, 1))
        dim = self.embed_dim
        for stage in range(4):
            for blk in range(self.depths[stage]):
                first = blk == 0 and stage > 0
                out_dim = dim * 2 if (blk == self.depths[stage] - 1
                                      and stage < 3) else dim
                x, thw = MViTBlock(
                    num_heads=self.heads[stage],
                    out_dim=out_dim,
                    q_stride=(1, 2, 2) if first else (1, 1, 1),
                    kv_stride=kv_strides[stage],
                    dtype=dt,
                    name=f"stage{stage}_block{blk}",
                )(x, thw)
                dim = out_dim
        x = nn.LayerNorm(dtype=dt, name="norm")(x)
        t, hh, ww = thw
        return x.reshape(b, t, hh, ww, dim)
