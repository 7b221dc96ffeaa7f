"""Core transformer building blocks (flax.linen).

TPU-first rebuilds of the BERT blocks the reference uses
(``lxrt/modeling_capsbert.py:327-560``): einsum attention with additive
masks, f32 softmax under a bf16 compute policy, shape-polymorphic modules.

Parity notes:
- GeLU is the exact erf form (reference ACT2FN['gelu']).
- LayerNorm eps 1e-12 (``modeling_capsbert.py`` BertLayerNorm usage).
- attention masks are ADDITIVE with -10000 on masked slots, exactly like
  ``NoCapsModel.forward`` (``modeling_capsbert.py:1826-1844``); helpers below
  build them from {0,1} masks.
- init: normal(0.02) for dense/embedding kernels, zero biases, LN ones/zeros
  (``init_bert_weights``, ``agqa_model.py:152-163``).
- torch ``nn.Embedding(padding_idx=0)``: row 0 is zero-initialized and
  receives no gradient.  ``Embed(zero_pad_idx=True)`` reproduces that by
  zeroing row 0 in the forward pass, which both zeroes its output and kills
  its gradient.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

NEG_MASK = -10000.0

bert_kernel_init = nn.initializers.normal(stddev=0.02)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GeLU, matching torch.nn.functional.gelu default.

    Written as x/2 * (1 + erf(x/sqrt(2))) — torch's own formulation —
    rather than jax.nn.gelu(approximate=False), whose erfc(-x/sqrt2) form
    lowers on TPU with a sign-bit bookkeeping pass (pred compare +
    shift-left bit-pack + u16 reduce_or fused into the surrounding ops:
    profiled round 2 inside the 14 ms tokenizer conv fusion).  The two
    differ only where 1+erf cancels (x < -3.8, where gelu(x) is below
    bf16 resolution anyway)."""
    x32 = x.astype(jnp.float32)
    y = x32 * 0.5 * (1.0 + jax.lax.erf(x32 * 0.7071067811865476))
    return y.astype(x.dtype)


REMAT_POLICIES = {
    # keep matmul outputs resident, recompute elementwise in backward —
    # trades cheap VPU recompute for the backward activation-streaming HBM
    # traffic (the b64 train profile's ~175 ms elementwise tail, PERF.md §2)
    "dots": "dots_with_no_batch_dims_saveable",
    "dots_batch": "dots_saveable",
}


def _resolve_policy(policy: str):
    if policy == "dots_attn":
        # dots + the fused-attention kernel's named outputs (out, lse) —
        # without the names, policy remat replays the pallas forward kernel
        # to rebuild the custom-VJP residuals (measured -7% at b64)
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_saveable,
            jax.checkpoint_policies.save_only_these_names(
                "attn_out", "attn_lse"))
    return getattr(jax.checkpoint_policies, REMAT_POLICIES[policy])


def remat_class(cls, static_argnums, enabled: bool, policy: str = ""):
    """nn.remat wrapper with an optional jax.checkpoint save policy.

    ``policy=''`` is classic full-recompute remat; named policies save the
    listed intermediates and recompute only the rest (see REMAT_POLICIES)."""
    if not enabled:
        return cls
    kw = {}
    if policy:
        kw["policy"] = _resolve_policy(policy)
    return nn.remat(cls, static_argnums=static_argnums, **kw)


def extend_mask(mask: jnp.ndarray, dtype: Dtype) -> jnp.ndarray:
    """{0,1} (B, L) -> additive (B, 1, 1, L) with -10000 on masked slots."""
    m = mask.astype(dtype)
    return ((1.0 - m) * NEG_MASK)[:, None, None, :]


class Embed(nn.Module):
    """Embedding table with torch ``padding_idx=0`` semantics: row 0 gets NO
    gradient (stop_gradient), so it stays frozen at its initial value.

    Two init regimes exist in the reference:
    - tables constructed and left alone (HGEmbeddings): torch zeroes the
      padding row at construction -> ``zero_init_pad=True``;
    - tables re-initialized by ``init_bert_weights`` from-scratch
      (BertEmbeddings under --fromScratch, entry.py:170-172): the re-init
      overwrites the zero with normal(0.02) and the row stays at that RANDOM
      value forever (grads still masked) -> ``zero_init_pad=False``.
    """

    num_embeddings: int
    features: int
    freeze_pad_idx: bool = True
    zero_init_pad: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.zero_init_pad:
            def init(key, shape):
                table = bert_kernel_init(key, shape)
                return table.at[0].set(0.0)
        else:
            init = bert_kernel_init
        table = self.param(
            "embedding", init, (self.num_embeddings, self.features)
        )
        if ids is None:
            # full-table read (HGEmbeddings weight-matrix-as-queries,
            # modeling_capsbert.py:319): torch padding_idx only masks
            # gradients of LOOKUPS -- direct .weight use trains row 0 too
            return table.astype(self.dtype)
        if self.freeze_pad_idx:
            table = table.at[0].set(jax.lax.stop_gradient(table[0]))
        return jnp.take(table.astype(self.dtype), ids, axis=0)


class LayerNorm(nn.Module):
    eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 return_params: bool = False) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        if return_params:
            # fused kernels (kernels/ffn.py) consume the f32 affine params
            # directly; x is only used for its feature width
            return scale, bias
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class Dense(nn.Module):
    features: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = bert_kernel_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
        )(x)


class Attention(nn.Module):
    """Multi-head attention over (hidden, context) with additive mask.

    Equivalent of BertAttention (``modeling_capsbert.py:358-423``): separate
    q/k/v dense layers, scores/softmax in f32, optional attention-prob output.
    """

    num_heads: int
    head_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,            # (B, Lq, D)
        context: jnp.ndarray,           # (B, Lk, D)
        mask: Optional[jnp.ndarray] = None,  # additive, broadcastable to (B, H, Lq, Lk)
        deterministic: bool = True,
        return_probs: bool = False,
    ):
        all_head = self.num_heads * self.head_dim
        q = Dense(all_head, dtype=self.dtype, name="query")(hidden)
        k = Dense(all_head, dtype=self.dtype, name="key")(context)
        v = Dense(all_head, dtype=self.dtype, name="value")(context)

        def split(x):
            b, l, _ = x.shape
            return x.reshape(b, l, self.num_heads, self.head_dim)

        q, k, v = split(q), split(k), split(v)

        from shgvqa_tpu.kernels import attention as pallas_attn

        # kernel scope: everywhere when globally enabled; training-only by
        # default (see kernels/attention.enable_train — inference loses,
        # training wins because in-kernel dropout skips the u32 bit tensors)
        use_kernel = (
            pallas_attn.is_enabled()
            or (not deterministic and pallas_attn.is_train_enabled())
        ) and not return_probs
        if use_kernel:
            rate = 0.0 if deterministic else self.dropout
            rng = self.make_rng("dropout") if rate > 0.0 else None
            out = pallas_attn.fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), mask,
                dropout_rate=rate, dropout_rng=rng,
            ).transpose(0, 2, 1, 3)
            out = out.reshape(out.shape[0], out.shape[1], all_head)
            return out, None

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(self.head_dim))
        if mask is not None:
            scores = scores + mask.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = probs.astype(self.dtype)
        probs_dropped = nn.Dropout(self.dropout)(
            probs, deterministic=deterministic
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", probs_dropped, v)
        out = out.reshape(out.shape[0], out.shape[1], all_head)
        if return_probs:
            return out, probs
        return out, None


class AttOutput(nn.Module):
    """dense -> dropout -> LN(residual) (BertAttOutput).

    NOT fused: a Pallas fused_out_ln variant (kernels/ffn.py) measured
    323 vs 328 clips/s on the inference bench — XLA already schedules the
    (D, D) dense + residual + LN tightly, and the per-call overhead loses.
    The kernel stays available with its tests as a recorded negative
    result; only the FFN block (3072-wide intermediate) fuses profitably."""

    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, residual: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h = Dense(residual.shape[-1], dtype=self.dtype, name="dense")(hidden)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return LayerNorm(dtype=self.dtype, name="ln")(h + residual)


class SelfAttLayer(nn.Module):
    """Self-attention + residual output (BertSelfattLayer)."""

    num_heads: int
    head_dim: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True, return_probs=False):
        out, probs = Attention(
            self.num_heads, self.head_dim, self.attn_dropout,
            dtype=self.dtype, name="self",
        )(x, x, mask, deterministic, return_probs)
        out = AttOutput(self.hidden_dropout, dtype=self.dtype, name="output")(
            out, x, deterministic
        )
        return out, probs


class CrossAttLayer(nn.Module):
    """Cross-attention + residual output (BertCrossattLayer)."""

    num_heads: int
    head_dim: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ctx_mask=None, deterministic=True,
                 return_probs=False):
        out, probs = Attention(
            self.num_heads, self.head_dim, self.attn_dropout,
            dtype=self.dtype, name="att",
        )(x, context, ctx_mask, deterministic, return_probs)
        out = AttOutput(self.hidden_dropout, dtype=self.dtype, name="output")(
            out, x, deterministic
        )
        return out, probs


class FFN(nn.Module):
    """intermediate(gelu) -> output dense -> dropout -> LN(residual).

    With the fused kernel enabled (kernels/ffn.py) and dropout inactive
    (deterministic — eval/inference), the whole block runs as one Pallas
    call.  The dense weights are recovered through the modules themselves
    (W = dense(I) - dense(0), b = dense(0)): two tiny extra matmuls that
    keep the parameter tree IDENTICAL to the unfused path (checkpoints,
    converters and parity tests see no difference), deliver exactly the
    bf16-rounded values the unfused matmuls consume, and stay fully
    differentiable."""

    intermediate_size: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        from shgvqa_tpu.kernels import ffn as pallas_ffn

        d = x.shape[-1]
        dense_int = Dense(self.intermediate_size, dtype=self.dtype,
                          name="intermediate")
        dense_out = Dense(d, dtype=self.dtype, name="output")
        ln = LayerNorm(dtype=self.dtype, name="ln")

        use_fused = (pallas_ffn.is_enabled() if deterministic
                     else pallas_ffn.is_train_enabled())
        if use_fused:
            eye_d = jnp.eye(d, dtype=self.dtype)
            eye_f = jnp.eye(self.intermediate_size, dtype=self.dtype)
            b1 = dense_int(jnp.zeros((1, d), self.dtype))
            w1 = dense_int(eye_d) - b1
            b2 = dense_out(jnp.zeros((1, self.intermediate_size),
                                     self.dtype))
            w2 = dense_out(eye_f) - b2
            gamma, beta = ln(x, return_params=True)
            if deterministic:
                return pallas_ffn.fused_ffn(
                    x, w1, b1[0], w2, b2[0], gamma, beta)
            rate = self.dropout
            rng = self.make_rng("dropout") if rate > 0.0 else None
            return pallas_ffn.fused_ffn_train(
                x, w1, b1[0], w2, b2[0], gamma, beta, rate, rng)

        h = dense_int(x)
        h = gelu(h)
        h = dense_out(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return ln(h + x)


class BertLayer(nn.Module):
    """Self-attention block + FFN block (BertLayer)."""

    num_heads: int
    head_dim: int
    intermediate_size: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True, return_probs=False):
        x, probs = SelfAttLayer(
            self.num_heads, self.head_dim, self.attn_dropout,
            self.hidden_dropout, dtype=self.dtype, name="attention",
        )(x, mask, deterministic, return_probs)
        x = FFN(self.intermediate_size, self.hidden_dropout,
                dtype=self.dtype, name="ffn")(x, deterministic)
        return x, probs


class BertEmbeddings(nn.Module):
    """word + position + token-type embeddings -> LN -> dropout.

    All three tables use torch padding_idx=0 semantics
    (``modeling_capsbert.py:330-340``): row 0 frozen at zero — including
    position 0 and segment 0, which is the published model's behavior.
    """

    vocab_size: int
    hidden_size: int
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        b, l = input_ids.shape
        pos_ids = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32), (b, l))
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        words = Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                      name="word_embeddings")(input_ids)
        pos = Embed(self.max_position_embeddings, self.hidden_size,
                    dtype=self.dtype, name="position_embeddings")(pos_ids)
        types = Embed(self.type_vocab_size, self.hidden_size,
                      dtype=self.dtype, name="token_type_embeddings")(
                          token_type_ids)
        x = words + pos + types
        x = LayerNorm(dtype=self.dtype, name="ln")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class Pooler(nn.Module):
    """CLS -> dense -> tanh (BertPooler)."""

    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, _unused=None):
        x = Dense(self.hidden_size, dtype=self.dtype, name="dense")(
            hidden_states[:, 0]
        )
        return jnp.tanh(x)


class Pooler2(nn.Module):
    """concat(CLS_a, CLS_b) -> dense -> tanh (BertPooler2,
    modeling_capsbert.py:1519-1533)."""

    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_a, hidden_b):
        x = jnp.concatenate([hidden_a[:, 0], hidden_b[:, 0]], axis=-1)
        x = Dense(self.hidden_size, dtype=self.dtype, name="dense2")(x)
        return jnp.tanh(x)


class MLPHead(nn.Module):
    """Linear -> GeLU -> LN -> Linear (the classifier-head shape used for
    logit_fc / class_embed / action_embed, agqa_model.py:105-140)."""

    out_dim: int
    hidden_mult: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = Dense(d * self.hidden_mult, dtype=self.dtype, name="fc1")(x)
        h = gelu(h)
        h = LayerNorm(dtype=self.dtype, name="ln")(h)
        return Dense(self.out_dim, dtype=self.dtype, name="fc2")(h)
