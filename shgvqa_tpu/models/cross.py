"""Cross-modal layer variants (--crossAttnType).

Rebuilds of ``modeling_capsbert.py:624-828``:

- 'cross' (published default, also aliased 'old'): bidirectional cross
  attention where BOTH directions share ONE attention block
  (``CrossLayer.cross_att`` calls ``self.visual_attention`` for lang<-visn
  and visn<-lang, :643-645), then per-stream FFNs.
- 'self': concatenate [visn; lang] and run joint self-attention with a single
  FFN.  (Reference latent defect: in the no-caps encoders nothing ever passes
  step=0 so the concat branch is unreachable and the lang slice is empty
  (``modeling_capsbert.py:696-704``); we implement the evident intent —
  concat on the first x-layer, joint sequence afterwards.)
- 'cross_self': bidirectional shared cross-attention, then joint
  self-attention over the concatenated streams, single FFN; output is split
  back into (lang, visn) slices (:756-828).

Each variant consumes ADDITIVE masks (already extended)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from shgvqa_tpu.models.layers import (
    CrossAttLayer,
    FFN,
    SelfAttLayer,
)

Dtype = Any


class CrossLayer(nn.Module):
    """Bidirectional cross-attention with a SHARED attention block."""

    num_heads: int
    head_dim: int
    intermediate_size: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lang, lang_mask, visn, visn_mask, step=None,
                 deterministic=True, return_probs=False):
        shared = CrossAttLayer(
            self.num_heads, self.head_dim, self.attn_dropout,
            self.hidden_dropout, dtype=self.dtype, name="visual_attention",
        )
        # one module instance, two calls -> tied weights (parity with
        # modeling_capsbert.py:643-645)
        lang_att, probs_xl = shared(lang, visn, visn_mask, deterministic,
                                    return_probs)
        visn_att, probs_xv = shared(visn, lang, lang_mask, deterministic,
                                    return_probs)
        lang_out = FFN(self.intermediate_size, self.hidden_dropout,
                       dtype=self.dtype, name="lang_ffn")(lang_att,
                                                          deterministic)
        visn_out = FFN(self.intermediate_size, self.hidden_dropout,
                       dtype=self.dtype, name="visn_ffn")(visn_att,
                                                          deterministic)
        return lang_out, visn_out, {"xl": probs_xl, "xv": probs_xv}


class SelfCrossLayer(nn.Module):
    """Joint self-attention over concat([visn; lang])."""

    num_heads: int
    head_dim: int
    intermediate_size: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lang, lang_mask, visn, visn_mask, step=0,
                 deterministic=True, return_probs=False):
        if step == 0:
            joint = jnp.concatenate([visn, lang], axis=1)
            joint_mask = _cat_masks(visn_mask, lang_mask,
                                    visn.shape[1], lang.shape[1])
        else:
            # later layers receive the already-joint sequence as `visn`
            joint, joint_mask = visn, visn_mask
        att, probs = SelfAttLayer(
            self.num_heads, self.head_dim, self.attn_dropout,
            self.hidden_dropout, dtype=self.dtype, name="cross_att",
        )(joint, joint_mask, deterministic, return_probs)
        out = FFN(self.intermediate_size, self.hidden_dropout,
                  dtype=self.dtype, name="vl_ffn")(att, deterministic)
        lang_len = lang.shape[1]
        lang_out = out[:, -lang_len:]
        return lang_out, out, {"vl": probs}


class CrossAndSelfLayer(nn.Module):
    """Shared cross-attention, then joint self-attention; splits output."""

    num_heads: int
    head_dim: int
    intermediate_size: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lang, lang_mask, visn, visn_mask, step=None,
                 deterministic=True, return_probs=False):
        shared = CrossAttLayer(
            self.num_heads, self.head_dim, self.attn_dropout,
            self.hidden_dropout, dtype=self.dtype, name="visual_attention",
        )
        lang_att, _ = shared(lang, visn, visn_mask, deterministic, False)
        visn_att, _ = shared(visn, lang, lang_mask, deterministic, False)
        joint = jnp.concatenate([visn_att, lang_att], axis=1)
        joint_mask = _cat_masks(visn_mask, lang_mask,
                                visn_att.shape[1], lang_att.shape[1])
        att, probs = SelfAttLayer(
            self.num_heads, self.head_dim, self.attn_dropout,
            self.hidden_dropout, dtype=self.dtype, name="self_att_layer",
        )(joint, joint_mask, deterministic, return_probs)
        out = FFN(self.intermediate_size, self.hidden_dropout,
                  dtype=self.dtype, name="vl_ffn")(att, deterministic)
        visn_len = visn.shape[1]
        return out[:, visn_len:], out[:, :visn_len], {"vl": probs}


def _cat_masks(visn_mask: Optional[jnp.ndarray],
               lang_mask: Optional[jnp.ndarray],
               visn_len: Optional[int] = None,
               lang_len: Optional[int] = None) -> Optional[jnp.ndarray]:
    """Concatenate additive masks (B,1,1,L) along the key axis.  A None side
    means "attend to everything": it is materialized as zeros when the other
    side is masked (lengths must then be provided)."""
    if visn_mask is None and lang_mask is None:
        return None
    if visn_mask is None:
        assert visn_len is not None, "need visn_len to fill missing mask"
        b = lang_mask.shape[0]
        visn_mask = jnp.zeros((b, 1, 1, visn_len), lang_mask.dtype)
    if lang_mask is None:
        assert lang_len is not None, "need lang_len to fill missing mask"
        b = visn_mask.shape[0]
        lang_mask = jnp.zeros((b, 1, 1, lang_len), visn_mask.dtype)
    return jnp.concatenate([visn_mask, lang_mask], axis=-1)


CROSS_LAYER_TYPES = {
    "cross": CrossLayer,
    "old": CrossLayer,
    "self": SelfCrossLayer,
    "cross_self": CrossAndSelfLayer,
}


def make_cross_layer(cross_attn_type: str, **kw) -> nn.Module:
    return CROSS_LAYER_TYPES[cross_attn_type](**kw)
