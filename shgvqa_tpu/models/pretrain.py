"""LXMERT-style pretraining heads (inventory parity with SURVEY.md §2.4).

The reference ships a vestigial pretraining subsystem
(``pretrain/lxmert_pretrain.py``, heads at ``modeling_capsbert.py:
1968-2125``) that the published AGQA/STAR recipes do NOT use (they train
``--fromScratch``).  Rebuilt here for completeness:

- masked-LM head: transform (dense+gelu+LN) -> decoder tied to the word
  embedding matrix + bias (BertLMPredictionHead);
- cross-modality matching head: pooled -> 2-way "is this caption for this
  video" (BertPreTrainingHeads.seq_relationship);
- QA head: pooled -> answer logits;
- contrastive loss: cosine-embedding with margin on matched/mismatched pairs
  (``modeling_capsbert.py`` CosineEmbeddingLoss usage);
- masking utilities: 15% word masking with 80/10/10 mask/random/keep and
  visual feature masking (``pretrain/lxmert_pretrain.py:86-148``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from shgvqa_tpu.models.layers import Dense, LayerNorm, gelu

Dtype = Any


class LMPredictionHead(nn.Module):
    """transform -> decode against the tied word-embedding table."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray,
                 word_embedding_table: jnp.ndarray) -> jnp.ndarray:
        d = hidden.shape[-1]
        h = Dense(d, dtype=self.dtype, name="transform_dense")(hidden)
        h = gelu(h)
        h = LayerNorm(dtype=self.dtype, name="transform_ln")(h)
        vocab = word_embedding_table.shape[0]
        bias = self.param("bias", nn.initializers.zeros, (vocab,))
        logits = jnp.einsum(
            "bld,vd->blv", h, word_embedding_table.astype(h.dtype))
        return logits + bias.astype(h.dtype)


class PretrainingHeads(nn.Module):
    """Masked-LM + cross-modal matching + QA heads over encoder outputs."""

    num_answers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lang_feats: jnp.ndarray, pooled: jnp.ndarray,
                 word_embedding_table: jnp.ndarray
                 ) -> Dict[str, jnp.ndarray]:
        from shgvqa_tpu.models.layers import MLPHead

        lm_logits = LMPredictionHead(dtype=self.dtype, name="lm_head")(
            lang_feats, word_embedding_table)
        matched_logits = Dense(2, dtype=self.dtype,
                               name="seq_relationship")(pooled)
        # same MLP shape as the fine-tune logit_fc (the reference's
        # answer_head.logit_fc, qa_answer_table.py:118-124) so the final
        # layer's rows are surgically transplantable per answer
        qa_logits = MLPHead(self.num_answers, dtype=self.dtype,
                            name="qa_head")(pooled)
        return {
            "lm_logits": lm_logits,
            "matched_logits": matched_logits,
            "qa_logits": qa_logits,
        }


# -- losses -----------------------------------------------------------------

def masked_lm_loss(lm_logits: jnp.ndarray, labels: jnp.ndarray
                   ) -> jnp.ndarray:
    """CE over positions with label >= 0 (-1 = unmasked/ignored)."""
    logp = jax.nn.log_softmax(lm_logits.astype(jnp.float32), axis=-1)
    valid = labels >= 0
    idx = jnp.maximum(labels, 0)
    nll = -jnp.take_along_axis(logp, idx[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def matched_loss(matched_logits: jnp.ndarray, is_matched: jnp.ndarray
                 ) -> jnp.ndarray:
    logp = jax.nn.log_softmax(matched_logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(
        jnp.take_along_axis(logp, is_matched[:, None].astype(jnp.int32),
                            axis=-1))


def cosine_contrastive_loss(a: jnp.ndarray, b: jnp.ndarray,
                            target: jnp.ndarray, margin: float = 0.1
                            ) -> jnp.ndarray:
    """torch CosineEmbeddingLoss: target +1 -> 1-cos, -1 -> max(0, cos-m)."""
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    cos = jnp.sum(a32 * b32, -1) / (
        jnp.linalg.norm(a32, axis=-1) * jnp.linalg.norm(b32, axis=-1) + 1e-8)
    pos = 1.0 - cos
    neg = jnp.maximum(cos - margin, 0.0)
    return jnp.mean(jnp.where(target > 0, pos, neg))


def visual_feat_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """L2 on masked visual features (visual_loss_config 'feat')."""
    diff = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_tok = jnp.mean(diff, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum(per_tok * m) / jnp.maximum(jnp.sum(m), 1)


# -- masking utilities (host-side, numpy) -----------------------------------

def mask_words(input_ids: np.ndarray, input_mask: np.ndarray,
               vocab_size: int, mask_token_id: int,
               rate: float = 0.15, rng: Optional[np.random.RandomState] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """BERT 80/10/10 masking.  Returns (masked_ids, lm_labels with -1 on
    unmasked)."""
    rng = rng or np.random.RandomState(0)
    ids = input_ids.copy()
    labels = np.full_like(ids, -1)
    candidates = input_mask.astype(bool)
    # never mask position 0 ([CLS])
    candidates[..., 0] = False
    pick = (rng.rand(*ids.shape) < rate) & candidates
    labels[pick] = ids[pick]
    roll = rng.rand(*ids.shape)
    ids[pick & (roll < 0.8)] = mask_token_id
    rand_ids = rng.randint(0, vocab_size, ids.shape)
    replace = pick & (roll >= 0.8) & (roll < 0.9)
    ids[replace] = rand_ids[replace]
    return ids, labels


def mask_visual_feats(feats: np.ndarray, rate: float = 0.15,
                      rng: Optional[np.random.RandomState] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Zero out a fraction of visual tokens; returns (masked, mask)."""
    rng = rng or np.random.RandomState(0)
    lead = feats.shape[:-1]
    mask = rng.rand(*lead) < rate
    out = feats.copy()
    out[mask] = 0.0
    return out, mask


class LxmertPretrainModel(nn.Module):
    """LXRT encoder + pretraining heads (LXRTPretraining,
    modeling_capsbert.py:1968-2125).

    The masked-LM decoder is TIED to the word-embedding table; callers pass
    the table extracted from the same param tree so gradients flow to the
    shared tensor (``params['params']['lxrt']['embeddings']
    ['word_embeddings']['embedding']``).  The encoder subtree is named
    ``lxrt`` so snapshots interoperate with ``Trainer.load_encoder`` /
    ``--loadLXMERT``.
    """

    cfg: Any     # shgvqa_tpu.configs.config.Config
    num_answers: int = 2

    def setup(self):
        from shgvqa_tpu.models.encoder import LXRTModel

        self.lxrt = LXRTModel(self.cfg.encoder, self.cfg.compute_dtype)
        self.heads = PretrainingHeads(num_answers=self.num_answers)
        d = self.cfg.encoder
        self.visn_head = Dense(d.visual_feat_dim, name="visn_head")

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 word_table: jnp.ndarray,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        pooled, lang, visn, _, _, _ = self.lxrt(
            batch["input_ids"], batch["input_mask"],
            batch.get("segment_ids"), batch["visual_feats"],
            batch.get("visual_mask"), deterministic,
        )
        out = self.heads(lang, pooled, word_table)
        # visual-feature regression head over the non-CLS tokens
        out["visn_pred"] = self.visn_head(visn[:, 1:])
        out["pooled"] = pooled
        out["lang_cls"] = lang[:, 0]
        return out


def answer_head_surgery(
    ans_weight: np.ndarray,     # pretraining head (n_pretrain_ans, d)
    ans_bias: np.ndarray,       # (n_pretrain_ans,)
    model_weight: np.ndarray,   # fine-tune head   (n_labels, d)
    model_bias: np.ndarray,     # (n_labels,)
    label2ans: Dict[int, str],
    table: "AnswerTable",
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """load_lxmert_qa answer-head surgery (qa_answer_table.py:118-143):
    for each fine-tune label whose normalized answer exists in the
    pretraining answer table, copy that row of the pretrained head; rows
    for unseen answers are ZEROED (not left at init).  Returns
    (new_weight, new_bias, loaded, unloaded)."""
    new_w = np.array(model_weight, copy=True)
    new_b = np.array(model_bias, copy=True)
    if isinstance(label2ans, (list, tuple)):
        label2ans = dict(enumerate(label2ans))
    loaded = unloaded = 0
    for label, ans in label2ans.items():
        idx = table.convert(ans)
        if idx >= 0:
            new_w[label] = ans_weight[idx]
            new_b[label] = ans_bias[idx]
            loaded += 1
        else:
            new_w[label] = 0.0
            new_b[label] = 0.0
            unloaded += 1
    return new_w, new_b, loaded, unloaded


class AnswerTable:
    """Cross-dataset answer normalization
    (``pretrain/qa_answer_table.py:8-81``): canonicalize answer strings
    (case, punctuation, article stripping) and map to ids."""

    _STRIP = ("a ", "an ", "the ")

    def __init__(self, answers):
        self.ans2id: Dict[str, int] = {}
        for ans in answers:
            norm = self.normalize(ans)
            if norm not in self.ans2id:
                self.ans2id[norm] = len(self.ans2id)
        self.id2ans = {i: a for a, i in self.ans2id.items()}

    @classmethod
    def normalize(cls, ans: str) -> str:
        out = ans.strip().lower().replace(",", "").replace(".", "")
        for art in cls._STRIP:
            if out.startswith(art):
                out = out[len(art):]
        return out.strip()

    def convert(self, ans: str) -> int:
        return self.ans2id.get(self.normalize(ans), -1)

    def __len__(self) -> int:
        return len(self.ans2id)
