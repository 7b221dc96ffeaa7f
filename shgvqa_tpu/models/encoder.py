"""Tri-stream LXMERT-style encoder (language / visual / cross-modal).

Rebuild of ``NoCapsEncoder``/``NoCapsModel`` (``modeling_capsbert.py:
1218-1302, 1787-1860``) plus the Q-only (``BertNoCapsEncoder:2200``) and deaf
(``DeafNoCapsEncoder:2470``) variants as one shape-polymorphic module.

Parity-critical semantics:
- x_layers are WEIGHT-TIED by default: the reference materializes one layer
  instance and lists it x_layers times (``modeling_capsbert.py:1247-1249``).
  Here: one flax submodule called in a loop (tied) vs a list (untied).
- the hypergraph decoder consumes the PRE-cross-attention stream snapshots
  (lang after l_layers, visn after r_layers) — the reference smuggles them
  through ``attn_probs[-1]`` (``modeling_capsbert.py:1302``,
  ``agqa_model.py:218``); we return them explicitly.
- deaf mode ('--taskVHGA') forces the language attention mask to all-masked
  (``modeling_capsbert.py:2588``): softmax over a constant -10000 row is
  uniform, so language tokens become uninformative.
- masks are additive -10000 built from {0,1} masks exactly like
  ``NoCapsModel.forward`` (:1826-1844).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from shgvqa_tpu.configs.config import EncoderConfig
from shgvqa_tpu.models.cross import CROSS_LAYER_TYPES
from shgvqa_tpu.models.layers import (
    BertEmbeddings,
    BertLayer,
    Pooler,
    Pooler2,
    extend_mask,
)
from shgvqa_tpu.models.visual import VisualTokenizer

Dtype = Any


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float64": jnp.float64}[name]


class TriStreamEncoder(nn.Module):
    """l_layers on text, r_layers on visual tokens, x_layers cross-modal."""

    cfg: EncoderConfig
    compute_dtype: str = "float32"
    remat: bool = False
    remat_policy: str = ""

    def setup(self):
        c = self.cfg
        dt = _dtype(self.compute_dtype)
        kw = dict(
            num_heads=c.num_heads,
            head_dim=c.head_dim,
            intermediate_size=c.intermediate_size,
            attn_dropout=c.attention_dropout,
            hidden_dropout=c.hidden_dropout,
            dtype=dt,
        )
        # rematerialize encoder blocks under grad to trade FLOPs for HBM
        # (jax.checkpoint; remat_policy="dots" keeps matmul outputs and
        # recomputes only the elementwise tail — see layers.remat_class)
        from shgvqa_tpu.models.layers import remat_class

        layer_cls = remat_class(BertLayer, (3, 4), self.remat,
                                self.remat_policy)
        if c.scan_layers:
            if c.vit_init or c.shared_weights:
                raise ValueError(
                    "vit_init/shared_weights r_layers are not available "
                    "with scan_layers; rerun with scan_layers=False")
            from shgvqa_tpu.models.scan_stacks import (
                ScannedBertStack,
                ScannedCrossStack,
            )

            stack_kw = dict(
                num_heads=c.num_heads, head_dim=c.head_dim,
                intermediate_size=c.intermediate_size,
                attn_dropout=c.attention_dropout,
                hidden_dropout=c.hidden_dropout, dtype=dt,
            )
            self.l_stack = ScannedBertStack(
                num_layers=c.l_layers, remat=self.remat,
                remat_policy=self.remat_policy, **stack_kw, name="l_stack")
            self.r_stack = ScannedBertStack(
                num_layers=c.r_layers, remat=self.remat,
                remat_policy=self.remat_policy, **stack_kw, name="r_stack")
            if (c.cross_attn_type in ("cross", "old")
                    and (c.no_caps or c.caps_cross_attn)):
                self.x_stack = ScannedCrossStack(
                    layer_cls=CROSS_LAYER_TYPES[c.cross_attn_type],
                    num_layers=c.x_layers, tie=c.tie_x_layers,
                    remat=self.remat, remat_policy=self.remat_policy,
                    **stack_kw, name="x_stack")
            else:
                self.x_stack = None
        if c.no_caps:
            self.visual_tokenizer = VisualTokenizer(
                hidden_size=c.hidden_size, dropout=c.hidden_dropout,
                patches=c.patches, dtype=dt
            )
        else:
            # capsule path (--noCaps off): EM-routing tokenizer producing
            # caps_dim tokens, projected to hidden_size for the BERT stack
            from shgvqa_tpu.models.capsules import (
                CapsuleVisualTokenizer,
                LanguageCapsuleMask,
            )
            from shgvqa_tpu.models.layers import Dense as _Dense

            self.caps_tokenizer = CapsuleVisualTokenizer(
                hidden_size=c.hidden_size,
                num_prim_caps=c.num_prim_caps,
                num_vis_caps=c.num_vis_caps,
                pose_dim=c.pose_dim,
                dropout=c.hidden_dropout,
                dtype=dt,
            )
            self.caps_proj = _Dense(c.hidden_size, dtype=dt)
            if c.caps_mask_features:
                self.caps_mask = LanguageCapsuleMask(
                    num_vis_caps=c.num_vis_caps,
                    pose_dim=c.pose_dim,
                    skip_connection=c.caps_skip_connection,
                    dtype=dt,
                )
        self.l_layers = [layer_cls(**kw, name=f"l_{i}")
                         for i in range(c.l_layers)]
        if c.shared_weights:
            # --sharedWeights: ONE weight set serves both streams — the
            # visual tokens run through the language layers (so the visual
            # stream depth is l_layers, exactly like the reference's
            # get_masked_vis_feats(self.layer, ...) call,
            # modeling_capsbert.py:1471-1477); takes precedence over
            # vit_init, whose branch the reference only reaches when NOT
            # shared (:1366)
            self.r_layers = []    # visual stream reuses l_layers (call site)
        elif c.vit_init:
            # --vitInit: r_layers are pre-LN ViT blocks (initialized from a
            # pretrained ViT-B/32 checkpoint via tools/convert_vit.py); they
            # take no attention mask, exactly as the reference invokes them
            # (modeling_capsbert.py:1401-1403)
            from shgvqa_tpu.models.vit import ViTBlock

            r_cls = remat_class(ViTBlock, (3, 4), self.remat,
                                self.remat_policy)
            self.r_layers = [
                r_cls(num_heads=c.num_heads, head_dim=c.head_dim,
                      mlp_ratio=c.intermediate_size // c.hidden_size,
                      dtype=dt, name=f"r_{i}")
                for i in range(c.r_layers)]
        else:
            self.r_layers = [layer_cls(**kw, name=f"r_{i}")
                             for i in range(c.r_layers)]
        x_layer_cls = CROSS_LAYER_TYPES[c.cross_attn_type]
        if not c.no_caps and not c.caps_cross_attn:
            # capsule path without --crossAttn: NO cross-modal layers exist
            # (modeling_capsbert.py:1360-1363, argparse default False) —
            # the streams only interact through capsule masking
            self.x_layers = []
        elif c.scan_layers and c.cross_attn_type in ("cross", "old"):
            self.x_layers = []    # scanned x_stack used instead
        elif c.tie_x_layers:
            self.x_layers = [x_layer_cls(**kw, name="x_tied")]
        else:
            self.x_layers = [x_layer_cls(**kw, name=f"x_{i}")
                             for i in range(c.x_layers)]

    def __call__(
        self,
        lang_emb: jnp.ndarray,                 # (B, Lt, D) embedded text
        lang_mask: Optional[jnp.ndarray],      # additive (B,1,1,Lt) or None
        visual_feats: jnp.ndarray,             # (B, T, H, W, C) backbone feats
        visn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_attentions: bool = False,
    ):
        """Returns (lang_out, visn_out, lang_snapshot, visn_snapshot[,
        attentions]) — attentions is a dict of per-stack lists when
        ``output_attentions`` (the reference's output_all_attention_masks,
        modeling_capsbert.py:1254-1302)."""
        c = self.cfg
        if c.no_caps:
            visn = self.visual_tokenizer(visual_feats, deterministic)
        else:
            caps = self.caps_tokenizer(visual_feats, deterministic)
            if c.caps_mask_features:
                caps = self.caps_mask(caps, lang_emb[:, 0])
            visn = self.caps_proj(caps)

        if c.scan_layers and not output_attentions:
            lang = self.l_stack(lang_emb, lang_mask, deterministic)
            lang_snapshot = lang
            visn = self.r_stack(visn, visn_mask, deterministic)
            visn_snapshot = visn
            if self.x_stack is not None:
                lang, visn = self.x_stack(lang, lang_mask, visn, visn_mask,
                                          deterministic)
            else:
                # 'self'/'cross_self' change sequence shapes per step;
                # run unrolled
                for step, layer in enumerate(
                        self.x_layers * c.x_layers if c.tie_x_layers
                        else self.x_layers):
                    lang, visn, _ = layer(
                        lang, lang_mask, visn, visn_mask, step=step,
                        deterministic=deterministic)
                    if c.cross_attn_type == "self" and step == 0:
                        from shgvqa_tpu.models.cross import _cat_masks

                        visn_mask = _cat_masks(
                            visn_mask, lang_mask,
                            visn.shape[1] - lang.shape[1], lang.shape[1])
            return lang, visn, lang_snapshot, visn_snapshot
        if c.scan_layers and output_attentions:
            raise ValueError(
                "output_attentions is unavailable with scan_layers; rerun "
                "with scan_layers=False for attention dumps")

        attn = {"lang": [], "visn": [], "cross": []}
        lang = lang_emb
        for layer in self.l_layers:
            # return_probs passed explicitly: nn.remat static_argnums index
            # both trailing booleans
            lang, p = layer(lang, lang_mask, deterministic, output_attentions)
            attn["lang"].append(p)
        lang_snapshot = lang

        # --sharedWeights: the visual stream reuses the LANGUAGE layers
        # (one weight set, l_layers-deep visual stack; see setup)
        r_layers = self.l_layers if c.shared_weights else self.r_layers
        for layer in r_layers:
            visn, p = layer(visn, visn_mask, deterministic, output_attentions)
            attn["visn"].append(p)
        visn_snapshot = visn

        x_layers = self.x_layers * c.x_layers if c.tie_x_layers else self.x_layers
        for step, layer in enumerate(x_layers):
            lang, visn, p = layer(lang, lang_mask, visn, visn_mask,
                                  step=step, deterministic=deterministic,
                                  return_probs=output_attentions)
            attn["cross"].append(p)
            if c.cross_attn_type == "self" and step == 0:
                # the joint [visn; lang] stream carries the concatenated mask
                # from the second layer on
                from shgvqa_tpu.models.cross import _cat_masks

                visn_mask = _cat_masks(
                    visn_mask, lang_mask,
                    visn.shape[1] - lang.shape[1], lang.shape[1])
        if output_attentions:
            return lang, visn, lang_snapshot, visn_snapshot, attn
        return lang, visn, lang_snapshot, visn_snapshot


class LanguageEncoder(nn.Module):
    """Q-only path (BertNoCapsEncoder/BertNoCapsModel)."""

    cfg: EncoderConfig
    compute_dtype: str = "float32"

    def setup(self):
        c = self.cfg
        dt = _dtype(self.compute_dtype)
        self.embeddings = BertEmbeddings(
            vocab_size=c.vocab_size,
            hidden_size=c.hidden_size,
            max_position_embeddings=c.max_position_embeddings,
            type_vocab_size=c.type_vocab_size,
            dropout=c.hidden_dropout,
            dtype=dt,
        )
        kw = dict(
            num_heads=c.num_heads,
            head_dim=c.head_dim,
            intermediate_size=c.intermediate_size,
            attn_dropout=c.attention_dropout,
            hidden_dropout=c.hidden_dropout,
            dtype=dt,
        )
        self.layers = [BertLayer(**kw, name=f"l_{i}")
                       for i in range(c.l_layers)]
        self.pooler = Pooler(c.hidden_size, dtype=dt)

    def __call__(self, input_ids, input_mask, segment_ids=None,
                 deterministic=True):
        dt = _dtype(self.compute_dtype)
        ext = extend_mask(input_mask, dt)
        x = self.embeddings(input_ids, segment_ids, deterministic)
        for layer in self.layers:
            x, _ = layer(x, ext, deterministic)
        return x, self.pooler(x)


class LXRTModel(nn.Module):
    """Full text+video encoder: embeddings -> tri-stream -> pooled output.

    Equivalent of NoCapsModel (modeling_capsbert.py:1787-1860); ``deaf=True``
    reproduces DeafNoCapsModel (language mask forced to zeros, :2588).
    Pooler choice follows the pooler_dict keyed by cross_attn_type
    (:1801-1810): 'cross' -> Pooler2(concat CLS of both streams), others ->
    single-stream Pooler.
    """

    cfg: EncoderConfig
    compute_dtype: str = "float32"
    deaf: bool = False
    remat: bool = False
    remat_policy: str = ""

    def setup(self):
        c = self.cfg
        dt = _dtype(self.compute_dtype)
        self.embeddings = BertEmbeddings(
            vocab_size=c.vocab_size,
            hidden_size=c.hidden_size,
            max_position_embeddings=c.max_position_embeddings,
            type_vocab_size=c.type_vocab_size,
            dropout=c.hidden_dropout,
            dtype=dt,
        )
        self.encoder = TriStreamEncoder(c, self.compute_dtype, self.remat,
                                        self.remat_policy)
        if c.cross_attn_type in ("cross",):
            self.pooler = Pooler2(c.hidden_size, dtype=dt)
        else:
            self.pooler = Pooler(c.hidden_size, dtype=dt)

    def __call__(self, input_ids, input_mask, segment_ids, visual_feats,
                 visual_mask=None, deterministic=True,
                 output_attentions=False):
        """visual_feats: (B, T, H, W, C); visual_mask: {0,1} (B, Lv) over
        tokenized visual sequence (the reference's dummy ``boxes`` of ones,
        agqa_data.py:216-217) or None.

        Returns (pooled, lang_out, visn_out, lang_snapshot, visn_snapshot,
        lang_ext_mask)."""
        dt = _dtype(self.compute_dtype)
        if self.deaf:
            input_mask = jnp.zeros_like(input_mask)
        lang_ext = extend_mask(input_mask, dt)
        visn_ext = extend_mask(visual_mask, dt) if visual_mask is not None else None

        emb = self.embeddings(input_ids, segment_ids, deterministic)
        attn = None
        if output_attentions:
            lang, visn, lang_snap, visn_snap, attn = self.encoder(
                emb, lang_ext, visual_feats, visn_ext, deterministic, True
            )
        else:
            lang, visn, lang_snap, visn_snap = self.encoder(
                emb, lang_ext, visual_feats, visn_ext, deterministic
            )
        # pooler(visn_feats, lang_feats) order per NoCapsModel.forward:1855.
        # With 'self'/'cross_self' the joint stream is `visn`; Pooler takes
        # its first token, matching the reference.
        if isinstance(self.pooler, Pooler2):
            pooled = self.pooler(visn, lang)
        else:
            pooled = self.pooler(visn)
        if output_attentions:
            return pooled, lang, visn, lang_snap, visn_snap, lang_ext, attn
        return pooled, lang, visn, lang_snap, visn_snap, lang_ext
