"""Vectorized featurization: text, hypergraph labels, masks.

Rebuilds the per-batch Python loops the reference runs on the host inside the
training loop (``lxrt/entry.py:38-121`` called from ``agqaHGQA.py:266-302``)
as vectorized numpy that executes once per batch in the input pipeline, so the
jitted train step sees only fixed-shape integer arrays.

Conventions preserved from the reference:
- question encoding: ``[CLS] q [SEP]`` then zero-pad to ``max_seq_length``
  (``entry.py:38-73``); padding id 0, mask 1 for real tokens.
- hypergraph label grids: per-situation label lists padded with 0 (class 0 is
  background; real labels start at 1) to ``num_rel``/``num_act`` wide
  (``agqa_data.py:301-336``), uniformly subsampled to ``num_situations``
  frames by nearest-neighbor linspace (``vis_utils.py:366-385``).
- hg_mask per situation: action-token mask then relation-token mask
  (``agqa_data.py:248-252``), matching the decoder's hg token order.
- segment ids for HG queries: situation index repeated per slot
  (``entry.py:84``).
- situation-causal mask: block upper-triangular additive -inf over situations
  (``entry.py:114-121``).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def uniform_subsample_indices(t: int, num_samples: int) -> np.ndarray:
    """Nearest-neighbor linspace indices, matching vis_utils.py:366-385."""
    assert t > 0 and num_samples > 0
    idx = np.linspace(0.0, float(t - 1), num_samples, dtype=np.float32)
    return np.clip(idx, 0, t - 1).astype(np.int64)


def encode_questions(sents: Sequence[str], tokenizer, max_seq_length: int
                     ) -> Dict[str, np.ndarray]:
    """[CLS] tokens [SEP] + zero pad; returns int32 (B, L) arrays."""
    n = len(sents)
    input_ids = np.zeros((n, max_seq_length), dtype=np.int32)
    input_mask = np.zeros((n, max_seq_length), dtype=np.int32)
    segment_ids = np.zeros((n, max_seq_length), dtype=np.int32)
    cls_id = tokenizer.vocab["[CLS]"]
    sep_id = tokenizer.vocab["[SEP]"]
    for i, sent in enumerate(sents):
        toks = tokenizer.convert_tokens_to_ids(tokenizer.tokenize(sent.strip()))
        toks = toks[: max_seq_length - 2]
        ids = [cls_id] + toks + [sep_id]
        input_ids[i, : len(ids)] = ids
        input_mask[i, : len(ids)] = 1
    return {
        "input_ids": input_ids,
        "input_mask": input_mask,
        "segment_ids": segment_ids,
    }


def hg_segment_ids(num_situations: int, slots_per_situation: int) -> np.ndarray:
    """Situation-index token-type ids for HG queries (entry.py:84)."""
    return np.repeat(
        np.arange(num_situations, dtype=np.int32), slots_per_situation
    )


def situation_causal_mask(num_situations: int, slots_per_situation: int,
                          neg: float = float("-inf")) -> np.ndarray:
    """Additive (Q, Q) mask: situation t attends to situations <= t.

    Equivalent to entry.py:114-121 (triu of -inf over situations, expanded to
    slot granularity).
    """
    situ = np.triu(np.full((num_situations, num_situations), neg,
                           dtype=np.float32), k=1)
    full = np.repeat(np.repeat(situ, slots_per_situation, axis=1),
                     slots_per_situation, axis=0)
    return full


def pack_hg_labels(per_situation_labels: Sequence[Sequence[int]],
                   num_situations: int, max_slots: int
                   ) -> Dict[str, np.ndarray]:
    """Ragged per-situation label lists -> fixed grid + lengths.

    Returns labels (S, K) int32 padded with 0, lengths (S,) int32 clamped to
    K (matching the a_lens/r_lens clamp at agqa_data.py:256-260), and the raw
    per-situation lengths before clamping.
    """
    t = len(per_situation_labels)
    grid = np.zeros((t, max_slots), dtype=np.int32)
    raw_lengths = np.zeros((t,), dtype=np.int32)
    for i, labs in enumerate(per_situation_labels):
        labs = list(labs)[:max_slots]
        grid[i, : len(labs)] = labs
        raw_lengths[i] = len(per_situation_labels[i])
    idx = uniform_subsample_indices(t, num_situations)
    labels = grid[idx]
    lengths = np.minimum(raw_lengths[idx], max_slots).astype(np.int32)
    return {"labels": labels, "lengths": lengths, "subsample_indices": idx}


def hg_token_mask(act_labels: np.ndarray, rel_labels: np.ndarray) -> np.ndarray:
    """Binary mask over hypergraph tokens, act slots then rel slots
    (agqa_data.py:248-252): 1 where the padded label grid is nonzero."""
    act_mask = (act_labels > 0).astype(np.int32)
    rel_mask = (rel_labels > 0).astype(np.int32)
    return np.concatenate([act_mask, rel_mask], axis=-1)


def one_hot_target(answer_idx: int, num_answers: int) -> np.ndarray:
    tgt = np.zeros((num_answers,), dtype=np.float32)
    tgt[answer_idx] = 1.0
    return tgt


def stack_batch(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of per-item feature dicts into batched arrays."""
    keys = items[0].keys()
    return {k: np.stack([it[k] for it in items], axis=0) for k in keys}
