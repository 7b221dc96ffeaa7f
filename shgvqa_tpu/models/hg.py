"""Hypergraph query embeddings and the HG<->question cross encoder.

Rebuilds of ``HGEmbeddings`` (``modeling_capsbert.py:299-325``) and
``CrossEncoder`` (``modeling_capsbert.py:1075-1215``).

HGEmbeddings semantics preserved:
- the ENTIRE (num_queries, D) embedding table is broadcast to the batch as
  learned queries (:319) — it is not indexed — except in GT-HG mode where
  ground-truth label ids are embedded instead (:316-317);
- torch padding_idx=0 on both tables: query row 0 and situation-0 type row
  are frozen at zero;
- sum -> LayerNorm(1e-12) -> dropout.

CrossEncoder semantics preserved:
- learned act/rel type tokens added per situation slot (act slots first,
  matching hg_in construction at ``agqa_model.py:255-258``), learned CLS
  prepended (all zero-init);
- hg attention mask gets a leading 1 for CLS then -10000 extension (:1187);
- x_layers weight-tied (same accidental tying as the main encoder, :1240);
- pooler by cross_attn_type: 'cross' -> Pooler2(hg CLS ++ lang CLS).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from shgvqa_tpu.configs.config import EncoderConfig
from shgvqa_tpu.models.cross import CROSS_LAYER_TYPES
from shgvqa_tpu.models.layers import Embed, LayerNorm, Pooler, Pooler2

Dtype = Any


class HGEmbeddings(nn.Module):
    num_queries: int
    hidden_size: int
    type_vocab_size: int = 16
    dropout: float = 0.1
    gt_hg: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, token_type_ids: jnp.ndarray,
                 token_ids: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """token_type_ids: (B, Q) situation indices.  Returns (B, Q, D)."""
        b = token_type_ids.shape[0]
        word = Embed(self.num_queries, self.hidden_size, zero_init_pad=True,
                     dtype=self.dtype, name="word_embeddings")
        if self.gt_hg and token_ids is not None:
            words = word(token_ids)
        else:
            table = word(None)  # full table as queries
            words = jnp.broadcast_to(
                table[None], (b, self.num_queries, self.hidden_size)
            )
        types = Embed(self.type_vocab_size, self.hidden_size,
                      zero_init_pad=True, dtype=self.dtype,
                      name="token_type_embeddings")(token_type_ids)
        x = words + types
        x = LayerNorm(dtype=self.dtype, name="ln")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class HGQCrossEncoder(nn.Module):
    """Question encoding cross-attended over predicted hypergraph tokens."""

    cfg: EncoderConfig
    num_max_act: int = 3
    num_max_rel: int = 8
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        lang_feats: jnp.ndarray,                 # (B, Lt, D)
        lang_ext_mask: Optional[jnp.ndarray],    # additive (B,1,1,Lt)
        hg_feats: jnp.ndarray,                   # (B, S*(A+R), D)
        hg_mask: Optional[jnp.ndarray] = None,   # {0,1} (B, S*(A+R)) or None
        deterministic: bool = True,
        output_attentions: bool = False,
    ):
        c = self.cfg
        dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
              "float64": jnp.float64}[self.compute_dtype]
        b, total, d = hg_feats.shape
        slots = self.num_max_act + self.num_max_rel
        s = total // slots

        act_token = self.param("act_token", nn.initializers.zeros, (1, 1, d))
        rel_token = self.param("rel_token", nn.initializers.zeros, (1, 1, d))
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d))

        type_tokens = jnp.concatenate(
            [
                jnp.broadcast_to(act_token, (1, self.num_max_act, d)),
                jnp.broadcast_to(rel_token, (1, self.num_max_rel, d)),
            ],
            axis=1,
        ).astype(dt)
        hg = hg_feats.reshape(b, s, slots, d) + type_tokens[None]
        hg = hg.reshape(b, total, d)
        cls = jnp.broadcast_to(cls_token.astype(dt), (b, 1, d))
        hg = jnp.concatenate([cls, hg], axis=1)

        if hg_mask is not None:
            full = jnp.concatenate(
                [jnp.ones((b, 1), dtype=hg_mask.dtype),
                 hg_mask.reshape(b, -1)],
                axis=1,
            )
            hg_ext = ((1.0 - full.astype(dt)) * -10000.0)[:, None, None, :]
        else:
            hg_ext = None

        if (c.scan_layers and not output_attentions
                and c.cross_attn_type in ("cross", "old")):
            from shgvqa_tpu.models.scan_stacks import ScannedCrossStack

            lang, hg_stream = ScannedCrossStack(
                layer_cls=CROSS_LAYER_TYPES[c.cross_attn_type],
                num_layers=c.x_layers, tie=True,
                num_heads=c.num_heads, head_dim=c.head_dim,
                intermediate_size=c.intermediate_size,
                attn_dropout=c.attention_dropout,
                hidden_dropout=c.hidden_dropout, dtype=dt,
                name="x_stack",
            )(lang_feats, lang_ext_mask, hg, hg_ext, deterministic)
            if c.cross_attn_type == "cross":
                pooled = Pooler2(c.hidden_size, dtype=dt, name="pooler")(
                    hg_stream, lang)
            else:
                pooled = Pooler(c.hidden_size, dtype=dt, name="pooler")(
                    hg_stream)
            return pooled

        layer_cls = CROSS_LAYER_TYPES[c.cross_attn_type]
        layer = layer_cls(
            num_heads=c.num_heads,
            head_dim=c.head_dim,
            intermediate_size=c.intermediate_size,
            attn_dropout=c.attention_dropout,
            hidden_dropout=c.hidden_dropout,
            dtype=dt,
            name="x_tied",
        )
        lang, hg_stream = lang_feats, hg
        attn = []
        for step in range(c.x_layers):
            lang, hg_stream, p = layer(lang, lang_ext_mask, hg_stream, hg_ext,
                                       step=step, deterministic=deterministic,
                                       return_probs=output_attentions)
            attn.append(p)
            if c.cross_attn_type == "self" and step == 0:
                from shgvqa_tpu.models.cross import _cat_masks

                hg_ext = _cat_masks(
                    hg_ext, lang_ext_mask,
                    hg_stream.shape[1] - lang.shape[1], lang.shape[1])

        if c.cross_attn_type == "cross":
            pooled = Pooler2(c.hidden_size, dtype=dt, name="pooler")(
                hg_stream, lang)
        else:
            pooled = Pooler(c.hidden_size, dtype=dt, name="pooler")(hg_stream)
        if output_attentions:
            return pooled, attn
        return pooled
