"""DETR-style transformer decoder for situation-hypergraph queries.

Rebuild of ``lxrt/transformer.py:86-297`` (post-norm variant, the one
``AGQAModel`` instantiates): per layer — self-attention over queries with the
situation-causal additive ``tgt_mask``, cross-attention into the visual
memory, ReLU FFN; residual + LayerNorm(eps=1e-5, torch default) after each.

Positional handling matches DETR: the learned query embedding is ADDED to q/k
at every layer (``with_pos_embed``), values stay position-free, and the
initial target is zeros (``agqa_model.py:235``).

Init parity: torch ``nn.MultiheadAttention`` packs q/k/v into one
xavier-uniform ``in_proj`` while ``init_bert_weights`` re-inits only Linear
modules, so after ``rel_decoder.apply(init_bert_weights)``
(``agqa_model.py:128``) in_proj stays xavier-uniform and out_proj/FFN become
normal(0.02).  We reproduce exactly that split.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from shgvqa_tpu.models.layers import Dense, bert_kernel_init

Dtype = Any


class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (packed qkv, additive mask)."""

    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None, deterministic=True):
        d = query.shape[-1]
        h = self.num_heads
        hd = d // h
        in_proj = nn.Dense(
            3 * d, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, name="in_proj",
        )
        # torch packs [q; k; v] along the output dim of one weight; applying
        # the same packed projection to each input slice-by-slice is
        # mathematically identical.
        wq = in_proj(query)[..., :d]
        wk = in_proj(key)[..., d:2 * d]
        wv = in_proj(value)[..., 2 * d:]

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, h, hd)

        q, k, v = split(wq), split(wk), split(wv)

        from shgvqa_tpu.kernels import attention as pallas_attn

        # training defaults to the fused kernel everywhere (in-kernel probs
        # dropout; the b64 train A/B that measured the win had it on at the
        # decoder sites too); inference keeps the sdpa/einsum paths below
        # unless is_decoder_enabled() opts the kernel in
        if pallas_attn.is_decoder_enabled() or (
                not deterministic and pallas_attn.is_train_enabled()):
            rate = 0.0 if deterministic else self.dropout
            rng = self.make_rng("dropout") if rate > 0.0 else None
            out = pallas_attn.fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), attn_mask,
                dropout_rate=rate, dropout_rng=rng,
            ).transpose(0, 2, 1, 3)
            out = out.reshape(out.shape[0], out.shape[1], d)
        elif deterministic and os.environ.get("SHGVQA_DEC_SDPA", "1") == "1":
            # jax.nn.dot_product_attention: same math (f32 logits,
            # 1/sqrt(hd) scale, additive bias), but XLA's canonical SDPA
            # pattern avoids the transposed-layout probs materialization
            # the hand-written einsum pair produces in-model (profiled
            # 6.6 ms at b64 for one decoder layer).  Deterministic only:
            # the reference drops out the PROBS, which sdpa can't express.
            bias = None
            if attn_mask is not None:
                bias = jnp.broadcast_to(
                    attn_mask.astype(jnp.float32), (1, 1) + attn_mask.shape
                ) if attn_mask.ndim == 2 else attn_mask.astype(jnp.float32)
            out = jax.nn.dot_product_attention(
                q, k, v, bias=bias, implementation="xla")
            out = out.reshape(out.shape[0], out.shape[1], d)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(hd))
            if attn_mask is not None:
                # additive (Lq, Lk) or broadcastable
                scores = scores + attn_mask.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = nn.Dropout(self.dropout)(
                probs, deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
            out = out.reshape(out.shape[0], out.shape[1], d)
        out = Dense(d, dtype=self.dtype, kernel_init=bert_kernel_init,
                    name="out_proj")(out)
        return out


class LayerNormT(nn.Module):
    """LayerNorm with torch-default eps=1e-5 (decoder norms)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(self.dtype)


class DecoderLayer(nn.Module):
    """Post-norm DETR decoder layer (transformer.py:187-244 forward_post)."""

    num_heads: int
    ffn_dim: int
    dropout: float = 0.15
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos, tgt_mask=None,
                 memory_mask=None, deterministic=True):
        drop = lambda x: nn.Dropout(self.dropout)(  # noqa: E731
            x, deterministic=deterministic)

        q = k = tgt + query_pos
        sa = TorchMHA(self.num_heads, self.dropout, dtype=self.dtype,
                      name="self_attn")(q, k, tgt, tgt_mask, deterministic)
        tgt = LayerNormT(dtype=self.dtype, name="norm1")(tgt + drop(sa))

        ca = TorchMHA(self.num_heads, self.dropout, dtype=self.dtype,
                      name="multihead_attn")(
            tgt + query_pos, memory, memory, memory_mask, deterministic)
        tgt = LayerNormT(dtype=self.dtype, name="norm2")(tgt + drop(ca))

        h = Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(tgt)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Dense(tgt.shape[-1], dtype=self.dtype, name="linear2")(h)
        tgt = LayerNormT(dtype=self.dtype, name="norm3")(tgt + drop(h))
        return tgt


class HGDecoder(nn.Module):
    """Stack of untied decoder layers (TransformerDecoder, deep-copied
    clones in the reference -> independent params here).

    ``scan=True`` runs the stack as lax.scan over stacked params — ~4x fewer
    XLA ops, measured 6x faster on per-op-dispatch backends."""

    num_layers: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.15
    dtype: Dtype = jnp.float32
    scan: bool = False
    remat: bool = False
    remat_policy: str = ""

    @nn.compact
    def __call__(self, query_pos, memory, tgt_mask=None, memory_mask=None,
                 deterministic=True):
        """query_pos: (B, Q, D) learned queries; initial tgt is zeros
        (agqa_model.py:235).  Returns (B, Q, D)."""
        tgt = jnp.zeros_like(query_pos)
        if self.scan:
            outer = self

            class Body(nn.Module):
                @nn.compact
                def __call__(self, carry, memory, query_pos, tgt_mask,
                             memory_mask, det):
                    out = DecoderLayer(
                        outer.num_heads, outer.ffn_dim, outer.dropout,
                        dtype=outer.dtype,
                    )(carry, memory, query_pos, tgt_mask, memory_mask, det)
                    return out, None

            from shgvqa_tpu.models.layers import remat_class

            body_cls = remat_class(Body, (6,), self.remat, self.remat_policy)
            scanned = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                in_axes=(nn.broadcast,) * 5,
            )
            out, _ = scanned(name="layers")(
                tgt, memory, query_pos, tgt_mask, memory_mask, deterministic)
            return out
        from shgvqa_tpu.models.layers import remat_class

        layer_cls = remat_class(DecoderLayer, (6,), self.remat,
                                self.remat_policy)
        for i in range(self.num_layers):
            tgt = layer_cls(
                self.num_heads, self.ffn_dim, self.dropout, dtype=self.dtype,
                name=f"layer_{i}",
            )(tgt, memory, query_pos, tgt_mask, memory_mask, deterministic)
        return tgt
