"""Full SHG-VQA task model assembly.

Rebuild of ``AGQAModel`` (``tasks/agqa_model.py:17-269``) and ``STARModel``
(``tasks/star_model.py``) as one task-routed flax module.

Forward contract (task 'hgqa'/'vhga'/'hgvqa'), matching agqa_model.py:166-269:
1. video backbone features -> tri-stream encoder; answer ``logit`` from the
   pooled post-cross-attention output through ``logit_fc`` (UNSUPERVISED in
   HGQA training — the reference computes it but backprops nothing through it,
   agqaHGQA.py:344-378).
2. the decoder memory is the PRE-cross-attention visual snapshot
   (``attn_probs[-1]`` in the reference; explicit return here), unless
   ``after_cross_attn_feats``.
3. rel/act HG decoders run from zero targets with the learned query tables as
   positional queries under the situation-causal mask; MLP heads produce
   class logits over (num_classes+1) with background 0.
4. hg tokens per situation = [act slots ++ rel slots] fed with act/rel type
   tokens + CLS into the HG<->question cross encoder; ``hg_logit`` via the
   SAME ``logit_fc`` module (shared head, agqa_model.py:205+266) — or
   ``logit_fc2`` on concat(x, x_hg) for 'hgvqa' (star_model.py:189-191).

GT-HG mode embeds ground-truth label ids as the hypergraph
(agqa_model.py:223-231) and skips the decoders.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from shgvqa_tpu.configs.config import Config
from shgvqa_tpu.data.featurize import hg_segment_ids, situation_causal_mask
from shgvqa_tpu.models.decoder import HGDecoder
from shgvqa_tpu.models.encoder import LXRTModel, LanguageEncoder
from shgvqa_tpu.models.hg import HGEmbeddings, HGQCrossEncoder
from shgvqa_tpu.models.layers import Dense, MLPHead

Dtype = Any


class ShgVqaModel(nn.Module):
    """Task-routed SHG-VQA model.

    Inputs come pre-featurized (static shapes) from the data pipeline; the
    video backbone runs outside this module (frozen feature extractor, like
    the reference's ``vid_encoder.eval()`` usage) or via
    ``models.backbone.SlowR50``.
    """

    cfg: Config

    def setup(self):
        cfg = self.cfg
        enc = cfg.encoder
        dt = cfg.compute_dtype
        task = cfg.task

        if task == "q":
            self.bert_encoder = LanguageEncoder(enc, dt)
        else:
            self.lxrt = LXRTModel(enc, dt, deaf=(task == "vhga"),
                                  remat=cfg.remat,
                                  remat_policy=cfg.remat_policy)

        if task in ("hgqa", "vhga", "hgvqa"):
            s = cfg.data.num_situations
            num_rel_q = cfg.data.num_rel_queries
            num_act_q = cfg.data.num_act_queries
            # GT-HG mode sizes the tables by class vocab (agqa_model.py:33-34)
            rel_table = cfg.num_rel_classes + 1 if cfg.gt_hg else num_rel_q
            act_table = cfg.num_act_classes + 1 if cfg.gt_hg else num_act_q
            self.relation_query_embed = HGEmbeddings(
                num_queries=rel_table,
                hidden_size=enc.hidden_size,
                type_vocab_size=s,
                gt_hg=cfg.gt_hg,
                dtype=_dt(dt),
            )
            self.action_query_embed = HGEmbeddings(
                num_queries=act_table,
                hidden_size=enc.hidden_size,
                type_vocab_size=s,
                dropout=cfg.decoder.emb_dropout,
                gt_hg=cfg.gt_hg,
                dtype=_dt(dt),
            )
            dec_kw = dict(
                num_layers=cfg.decoder.num_layers,
                num_heads=cfg.decoder.num_heads,
                ffn_dim=cfg.decoder.ffn_dim,
                dropout=cfg.decoder.dropout,
                dtype=_dt(dt),
                scan=enc.scan_layers,
                remat=cfg.remat,
                remat_policy=cfg.remat_policy,
            )
            self.rel_decoder = HGDecoder(**dec_kw)
            self.action_decoder = HGDecoder(**dec_kw)
            if cfg.decoder.linear_cls:
                self.class_embed = Dense(cfg.num_rel_classes + 1, dtype=_dt(dt))
                self.action_embed = Dense(cfg.num_act_classes + 1, dtype=_dt(dt))
            else:
                self.class_embed = MLPHead(cfg.num_rel_classes + 1, dtype=_dt(dt))
                self.action_embed = MLPHead(cfg.num_act_classes + 1, dtype=_dt(dt))
            self.hgq_encoder = HGQCrossEncoder(
                enc,
                num_max_act=cfg.data.num_act,
                num_max_rel=cfg.data.num_rel,
                compute_dtype=dt,
            )
            if task == "hgvqa":
                self.logit_fc2 = MLPHead(cfg.num_answers, dtype=_dt(dt))

        self.logit_fc = MLPHead(cfg.num_answers, dtype=_dt(dt))
        # per-choice QA (--qaArrangeType add_sep/no_sep): each (q, choice)
        # pair is encoded separately and scored with a scalar head; the
        # reference carries qa0..qa3 through the batch but never wired them
        # into the model ('we will add choices later', star_data.py:191-196)
        if task != "q" and cfg.data.qa_arrange_type in ("add_sep", "no_sep"):
            self.choice_score_fc = MLPHead(1, dtype=_dt(dt))
            if task == "hgvqa":
                self.choice_score_fc2 = MLPHead(1, dtype=_dt(dt))

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 deterministic: bool = True,
                 output_attentions: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        task = cfg.task

        if task == "q":
            _, pooled = self.bert_encoder(
                batch["input_ids"], batch["input_mask"],
                batch.get("segment_ids"), deterministic,
            )
            return {"logit": self.logit_fc(pooled)}

        per_choice = ("choice_input_ids" in batch
                      and cfg.data.qa_arrange_type in ("add_sep", "no_sep"))
        if per_choice:
            # fold the choice axis into batch for the language side; visual
            # inputs repeat per choice (the visual stream pre-cross is
            # choice-independent and is deduplicated again below)
            bsz, nch, lt = batch["choice_input_ids"].shape
            ids = batch["choice_input_ids"].reshape(bsz * nch, lt)
            imask = batch["choice_input_mask"].reshape(bsz * nch, lt)
            seg = batch["choice_segment_ids"].reshape(bsz * nch, lt)
            vfeats = jnp.repeat(batch["visual_feats"], nch, axis=0)
            vmask = batch.get("visual_mask")
            if vmask is not None:
                vmask = jnp.repeat(vmask, nch, axis=0)
        else:
            ids = batch["input_ids"]
            imask = batch["input_mask"]
            seg = batch.get("segment_ids")
            vfeats = batch["visual_feats"]
            vmask = batch.get("visual_mask")

        attentions = {}
        if output_attentions:
            (pooled, lang, visn, lang_snap, visn_snap, lang_ext,
             enc_attn) = self.lxrt(
                ids, imask, seg, vfeats, vmask, deterministic, True,
            )
            attentions["encoder"] = enc_attn
        else:
            pooled, lang, visn, lang_snap, visn_snap, lang_ext = self.lxrt(
                ids, imask, seg, vfeats, vmask, deterministic,
            )
        if per_choice:
            logit = self.choice_score_fc(pooled).reshape(bsz, nch)
        else:
            logit = self.logit_fc(pooled)
        if task == "vqa":
            return {"logit": logit}

        # decoder memory: pre-cross-attention visual stream by default
        # (agqa_model.py:215-218)
        memory = visn if cfg.after_cross_attn_feats else visn_snap
        lang_feats = lang if cfg.after_cross_attn_feats else lang_snap
        if per_choice:
            # the pre-cross visual snapshot is identical across a clip's
            # choices: decode the hypergraph ONCE per clip
            memory = memory.reshape(bsz, nch, *memory.shape[1:])[:, 0]

        b = memory.shape[0]
        s = cfg.data.num_situations
        d = cfg.encoder.hidden_size

        rel_seg = jnp.asarray(
            hg_segment_ids(s, cfg.data.num_rel), dtype=jnp.int32)
        act_seg = jnp.asarray(
            hg_segment_ids(s, cfg.data.num_act), dtype=jnp.int32)
        rel_seg = jnp.broadcast_to(rel_seg[None], (b, rel_seg.shape[0]))
        act_seg = jnp.broadcast_to(act_seg[None], (b, act_seg.shape[0]))

        if cfg.gt_hg and "rel_tgt_ids" in batch and "act_tgt_ids" in batch:
            rel_q = self.relation_query_embed(
                rel_seg, batch["rel_tgt_ids"], deterministic)
            act_q = self.action_query_embed(
                act_seg, batch["act_tgt_ids"], deterministic)
            rel_out, act_out = rel_q, act_q
            rel_preds = act_preds = None
        else:
            rel_mask = jnp.asarray(_np_causal(s, cfg.data.num_rel))
            act_mask = jnp.asarray(_np_causal(s, cfg.data.num_act))
            rel_q = self.relation_query_embed(rel_seg, None, deterministic)
            act_q = self.action_query_embed(act_seg, None, deterministic)
            rel_out = self.rel_decoder(rel_q, memory, rel_mask,
                                       deterministic=deterministic)
            act_out = self.action_decoder(act_q, memory, act_mask,
                                          deterministic=deterministic)
            rel_preds = self.class_embed(rel_out)
            act_preds = self.action_embed(act_out)

        # hg tokens: per situation [act slots ++ rel slots]
        hg_in = jnp.concatenate(
            [act_out.reshape(b, s, -1, d), rel_out.reshape(b, s, -1, d)],
            axis=2,
        ).reshape(b, -1, d)

        hg_mask = batch.get("hg_mask") if cfg.use_hg_mask else None
        if per_choice:
            # question<->hypergraph cross-attention runs per (q, choice)
            hg_in = jnp.repeat(hg_in, nch, axis=0)
            if hg_mask is not None:
                hg_mask = jnp.repeat(hg_mask, nch, axis=0)
        if output_attentions:
            x_hg, hgq_attn = self.hgq_encoder(lang_feats, lang_ext, hg_in,
                                              hg_mask, deterministic, True)
            attentions["hgq"] = hgq_attn
        else:
            x_hg = self.hgq_encoder(lang_feats, lang_ext, hg_in, hg_mask,
                                    deterministic)
        if per_choice:
            if task == "hgvqa":
                hg_logit = self.choice_score_fc2(jnp.concatenate(
                    [pooled, x_hg], axis=-1)).reshape(bsz, nch)
            else:
                hg_logit = self.choice_score_fc(x_hg).reshape(bsz, nch)
        elif task == "hgvqa":
            hg_logit = self.logit_fc2(
                jnp.concatenate([pooled, x_hg], axis=-1))
        else:
            hg_logit = self.logit_fc(x_hg)

        out = {"logit": logit, "hg_logit": hg_logit}
        if rel_preds is not None:
            out["rel_preds"] = rel_preds
            out["act_preds"] = act_preds
        if output_attentions:
            out["attentions"] = attentions
        return out


class VideoShgVqaModel(nn.Module):
    """Frames->answer model: slow_r50 backbone + ShgVqaModel head.

    The backbone runs in eval mode (frozen BatchNorm running stats) like the
    reference's ``vid_encoder.eval()`` (``agqaHGQA.py:263``); with
    ``cfg.freeze_backbone`` its params also get no gradient (STAR recipe,
    ``star.py:87-88``) via stop_gradient — pair with a trainable_mask on the
    optimizer to skip the moment buffers too.
    """

    cfg: Config

    def setup(self):
        if self.cfg.encoder.patches:
            # --patches: ViT-style linear patch tokenizer consumes the
            # normalized frames directly — no backbone is built
            # (modeling_capsbert.py:978-996 evident intent; the reference's
            # own patches forward is latent-broken, see models/visual.py)
            self.backbone = None
        else:
            from shgvqa_tpu.models.backbone import make_backbone

            if self.cfg.quant_backbone and not self.cfg.freeze_backbone:
                raise ValueError(
                    "--quantBackbone requires a frozen trunk: the int8 "
                    "forward has zero gradient through round()")
            self.backbone = make_backbone(
                self.cfg.backbone, dtype=_dt(self.cfg.compute_dtype),
                quant=self.cfg.quant_backbone)
        self.head = ShgVqaModel(self.cfg)

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 deterministic: bool = True,
                 output_attentions: bool = False) -> Dict[str, jnp.ndarray]:
        if "frames" in batch and self.cfg.task != "q":
            feats = self.encode_frames(batch, deterministic)
            batch = {k: v for k, v in batch.items() if k != "frames"}
            batch["visual_feats"] = feats
        return self.head(batch, deterministic, output_attentions)

    def encode_frames(self, batch: Dict[str, jnp.ndarray],
                      deterministic: bool = True) -> jnp.ndarray:
        """frames -> visual features: on-device convert/augment/normalize +
        the (frozen) trunk.  Public as an apply ``method`` so the Trainer's
        two-launch mode can run the gradient-free trunk as its OWN jitted
        program (round-5 A/B: the frozen trunk schedules ~2x slower inside
        the backward-bearing program — tools/bench_train.py two-launch)."""
        from shgvqa_tpu.data.transforms import (
            NORM_STATS,
            aug_mix_batch,
            normalize_clip,
            rand_augment_batch,
        )

        frames = batch["frames"]
        aug = self.cfg.data.augment_type
        aug_on = (not deterministic
                  and aug in ("rand_aug", "rand_aug_slowfast", "aug_mix"))
        mean, std = NORM_STATS.get(self.cfg.backbone,
                                   NORM_STATS["slow_r50"])
        from functools import partial as _partial

        if aug == "aug_mix":
            aug_fn = _partial(
                aug_mix_batch, subbatch=self.cfg.data.aug_subbatch,
                fold_chains=self.cfg.data.aug_fold_chains)
        else:
            aug_fn = _partial(
                rand_augment_batch,
                subbatch=self.cfg.data.aug_subbatch)

        # frames pipeline dtype: bf16 halves the HBM traffic of every
        # full-frames pass (convert/augment/normalize) — see
        # DataConfig.aug_dtype
        pix_dt = _dt(self.cfg.data.aug_dtype or self.cfg.compute_dtype)

        def preprocess(x, keys=None):
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x.astype(pix_dt) / jnp.asarray(255.0, pix_dt)
            else:
                x = x.astype(pix_dt)
            if aug_on:
                # batched formulation: vmap(rand_augment)'s switch
                # lowering runs all 14 ops per layer (6.6s/batch
                # on-chip at b32); the batched version samples
                # identically but executes each op class once per
                # layer (see data/transforms.py)
                x = aug_fn(x, keys)
            return normalize_clip(x, mean, std)

        # per-clip keys: every augment op draws independently per clip,
        # so chunked execution below is sample-identical
        keys = (jax.random.split(self.make_rng("augment"),
                                 frames.shape[0]) if aug_on else None)
        if self.cfg.encoder.patches:
            from shgvqa_tpu.models.visual import patchify_clip

            enc = self.cfg.encoder
            return patchify_clip(
                preprocess(frames, keys), enc.visual_t, enc.visual_hw)
        nc = self.cfg.backbone_chunks
        # a quant calibration pass (mutable quant_stats, e.g. init)
        # must not run under nn.scan: the scale variables are broadcast
        # there and flax forbids mutating broadcast collections
        calibrating = (bool(self.cfg.quant_backbone)
                       and self.is_mutable_collection("quant_stats"))
        if (nc > 1 and self.cfg.freeze_backbone and not calibrating
                and frames.shape[0] % nc == 0):
            # Sequential micro-chunks bound the preprocessing + frozen
            # trunk's activation peak (weights broadcast, batch_stats
            # read-only eval-mode BN).  The WHOLE frames path runs
            # per-chunk: chunking only the trunk still materializes
            # full-batch (B,T,224,224,3) convert/augment/normalize
            # tensors (9.6 GB f32 at b128), which was the actual spill.
            csz = frames.shape[0] // nc
            fx = frames.reshape((nc, csz) + frames.shape[1:])
            if aug_on:
                kx = keys.reshape((nc, csz) + keys.shape[1:])
                body = lambda mdl, c, xk: (c, mdl(preprocess(*xk)))
                xs = (fx, kx)
            else:
                body = lambda mdl, c, x: (c, mdl(preprocess(x)))
                xs = fx
            _, feats = nn.scan(
                body,
                variable_broadcast=["params", "batch_stats",
                                    "quant_stats"],
                split_rngs={"params": False, "dropout": False},
                in_axes=0, out_axes=0)(self.backbone, None, xs)
            feats = feats.reshape((frames.shape[0],) + feats.shape[2:])
        else:
            feats = self.backbone(preprocess(frames, keys))
        if self.cfg.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        return feats


def _dt(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float64": jnp.float64}[name]


def _np_causal(s: int, slots: int) -> np.ndarray:
    # -inf additive mask is constant; computed at trace time (static shapes)
    return situation_causal_mask(s, slots).astype(np.float32)
