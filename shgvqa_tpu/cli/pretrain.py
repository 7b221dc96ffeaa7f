"""LXMERT-style pretraining driver (``pretrain/lxmert_pretrain.py`` rebuilt
TPU-native).

Tasks (reference flags preserved): ``--taskMaskLM`` masked-LM over the
question tokens (15% with 80/10/10), ``--taskMatched`` cross-modality
matching with 50% mismatched sentence swaps, ``--taskQA`` answer
classification on matched rows, ``--taskContrastive`` cosine-embedding loss
between the language CLS and visual CLS, ``--taskObjPredict`` masked
visual-feature regression (visual_losses 'feat'; the reference's obj/attr
vocab losses need Faster-RCNN label dumps that do not exist for video --
documented divergence).

Data: ``--syntheticData N`` generates schema-matching items; otherwise
``{dataDir}/pretrain_items.json`` with
``[{"sent": str, "feat_file": npz path, "answer": str?}, ...]`` replaces the
reference's COCO/GQA tsv feature pipeline (``pretrain/lxmert_data.py``) --
a one-file contract instead of 40GB tsv shards.

Encoder snapshots save as ``{output}/Epoch{N}_LXRT`` in the exact format
``Trainer.load_encoder`` / ``--loadLXMERT`` consumes, and the QA head is
saved alongside for ``load_lxmert_qa`` answer-head surgery.
"""

from __future__ import annotations

import os
import sys
import zlib
from functools import partial
from typing import Dict, List

import numpy as np


def synthetic_pretrain_items(n: int, cfg, n_answers: int = 16, seed: int = 0
                             ) -> List[dict]:
    rng = np.random.RandomState(seed)
    words = ["person", "opens", "door", "holds", "cup", "table", "walks",
             "room", "takes", "puts", "closes", "watches", "book", "food"]
    items = []
    for i in range(n):
        k = rng.randint(4, 10)
        items.append({
            "sent": " ".join(rng.choice(words, size=k)),
            "answer": f"ans{rng.randint(n_answers)}",
            "_seed": i,
        })
    return items


def main(argv=None) -> dict:
    from shgvqa_tpu.configs.cli import parse_reference_flags_with_extras

    cfg, extras = parse_reference_flags_with_extras(argv, dataset="agqa")
    pt = extras["pretrain"]
    if not any((pt["task_mask_lm"], pt["task_matched"], pt["task_qa"],
                pt["task_contrastive"], pt["task_obj_predict"])):
        # reference default recipe: LM + matched + QA
        pt["task_mask_lm"] = pt["task_matched"] = pt["task_qa"] = True

    import jax
    import jax.numpy as jnp
    import optax

    from shgvqa_tpu.cli.common import build_tokenizer
    from shgvqa_tpu.data import featurize
    from shgvqa_tpu.models.pretrain import (
        AnswerTable,
        LxmertPretrainModel,
        cosine_contrastive_loss,
        mask_visual_feats,
        mask_words,
        masked_lm_loss,
        matched_loss,
        visual_feat_loss,
    )
    from shgvqa_tpu.train.optimizer import make_optimizer

    n_syn = extras.get("synthetic_data") or 0
    if n_syn:
        items = synthetic_pretrain_items(n_syn, cfg)
    else:
        from shgvqa_tpu.utils import load_json_or_pickle

        items = load_json_or_pickle(
            os.path.join(cfg.data.data_dir, "pretrain_items.json"))

    tok = build_tokenizer(cfg, extras, [x["sent"] for x in items])
    table = AnswerTable([x.get("answer", "") for x in items if
                         x.get("answer")])
    num_answers = max(len(table), 2)

    enc = featurize.encode_questions(
        [x["sent"] for x in items], tok, cfg.data.max_seq_length)
    answers = np.array([table.convert(x.get("answer", "")) for x in items],
                       np.int32)

    e = cfg.encoder
    t_in = e.visual_t + 8

    def feats_for(i: int) -> np.ndarray:
        it = items[i]
        if "_seed" in it:
            rng = np.random.RandomState(
                zlib.crc32(f"feat{it['_seed']}".encode()) % (2 ** 31))
            return rng.randn(t_in, e.visual_hw, e.visual_hw,
                             e.visual_feat_dim).astype(np.float32)
        with np.load(it["feat_file"]) as z:
            return z["feats"].astype(np.float32)

    model = LxmertPretrainModel(cfg, num_answers=num_answers)
    bsz = cfg.optim.batch_size
    steps_per_epoch = max(1, len(items) // bsz)
    t_total = steps_per_epoch * cfg.optim.epochs
    tx = make_optimizer(lr=cfg.optim.lr, t_total=t_total,
                        warmup=0.1, flat=False)

    mask_id = tok.vocab.get("[MASK]", 1)
    vocab_size = e.vocab_size

    def make_batch(idx: np.ndarray, rng: np.random.RandomState
                   ) -> Dict[str, np.ndarray]:
        ids = enc["input_ids"][idx].copy()
        im = enc["input_mask"][idx].copy()
        seg = enc["segment_ids"][idx].copy()
        feats = np.stack([feats_for(int(i)) for i in idx])
        is_matched = np.ones((len(idx),), np.int32)
        if pt["task_matched"]:
            # 50% of rows get another item's sentence (lxmert_data 'matched')
            swap = rng.rand(len(idx)) < 0.5
            perm = rng.permutation(len(idx))
            for r in np.where(swap)[0]:
                o = perm[r]
                if int(idx[o]) != int(idx[r]):
                    ids[r], im[r], seg[r] = (enc["input_ids"][idx[o]],
                                             enc["input_mask"][idx[o]],
                                             enc["segment_ids"][idx[o]])
                    is_matched[r] = 0
        lm_labels = np.full_like(ids, -1)
        if pt["task_mask_lm"]:
            ids, lm_labels = mask_words(
                ids, im, mask_token_id=mask_id, vocab_size=vocab_size,
                rate=pt["word_mask_rate"], rng=rng)
        feat_mask = np.zeros(feats.shape[:-1], np.float32)
        feats_in = feats
        if pt["task_obj_predict"]:
            feats_in, feat_mask = mask_visual_feats(
                feats, rate=pt["obj_mask_rate"], rng=rng)
        # regression targets at TOKEN granularity: the conv tokenizer
        # compresses t_in -> visual_t, so subsample targets/mask to the
        # token grid (the reference regresses per-region features with no
        # compression, lxmert_pretrain.py:129-148 -- video divergence)
        sub = featurize.uniform_subsample_indices(feats.shape[1], e.visual_t)
        tgt_tok = feats[:, sub].reshape(len(idx), -1, feats.shape[-1])
        mask_tok = feat_mask[:, sub].reshape(len(idx), -1)
        return {
            "input_ids": ids.astype(np.int32),
            "input_mask": im.astype(np.int32),
            "segment_ids": seg.astype(np.int32),
            "visual_feats": feats_in,
            "visual_target": tgt_tok,
            "feat_mask": mask_tok,
            "lm_labels": lm_labels.astype(np.int32),
            "is_matched": is_matched,
            "qa_labels": answers[idx],
        }

    def loss_fn(params, batch, key):
        word_table = params["params"]["lxrt"]["embeddings"][
            "word_embeddings"]["embedding"]
        out = model.apply(
            params,
            {k: batch[k] for k in ("input_ids", "input_mask", "segment_ids",
                                   "visual_feats")},
            word_table, deterministic=False, rngs={"dropout": key})
        metrics = {}
        total = jnp.float32(0.0)
        if pt["task_mask_lm"]:
            lm = masked_lm_loss(out["lm_logits"], batch["lm_labels"])
            total, metrics["lm_loss"] = total + lm, lm
        if pt["task_matched"]:
            ml = matched_loss(out["matched_logits"], batch["is_matched"])
            total, metrics["matched_loss"] = total + ml, ml
        if pt["task_qa"]:
            # QA CE on matched rows with a known answer (lxmert_pretrain
            # masks mismatched sentences out of the QA loss)
            logp = jax.nn.log_softmax(
                out["qa_logits"].astype(jnp.float32), -1)
            valid = (batch["is_matched"] > 0) & (batch["qa_labels"] >= 0)
            nll = -jnp.take_along_axis(
                logp, jnp.maximum(batch["qa_labels"], 0)[:, None], 1)[:, 0]
            qa = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
                jnp.sum(valid), 1)
            total, metrics["qa_loss"] = total + qa, qa
        if pt["task_contrastive"]:
            tgt = batch["is_matched"] * 2 - 1
            cl = cosine_contrastive_loss(out["lang_cls"], out["pooled"], tgt)
            total, metrics["contrastive_loss"] = total + cl, cl
        if pt["task_obj_predict"] and "feat" in pt["visual_losses"]:
            vf = visual_feat_loss(out["visn_pred"], batch["visual_target"],
                                  batch["feat_mask"])
            total, metrics["visn_loss"] = total + vf, vf
        metrics["total_loss"] = total
        return total, metrics

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, key):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    rng = np.random.RandomState(cfg.seed)
    example = make_batch(np.arange(min(bsz, len(items))), rng)
    key = jax.random.PRNGKey(cfg.seed)
    params = jax.jit(lambda k, b: model.init(
        k, {kk: b[kk] for kk in ("input_ids", "input_mask", "segment_ids",
                                 "visual_feats")},
        jnp.zeros((e.vocab_size, e.hidden_size), jnp.float32),
        deterministic=True))(key, example)
    opt_state = jax.jit(tx.init)(params)

    os.makedirs(cfg.output, exist_ok=True)
    last = {}
    for epoch in range(cfg.optim.epochs):
        order = rng.permutation(len(items))
        for s in range(steps_per_epoch):
            idx = order[s * bsz:(s + 1) * bsz]
            if len(idx) < bsz:
                break
            batch = make_batch(idx, rng)
            params, opt_state, metrics = train_step(
                params, opt_state, batch,
                jax.random.fold_in(key, epoch * steps_per_epoch + s))
        last = {k: float(v) for k, v in metrics.items()}
        print(f"Epoch {epoch}: " + " ".join(
            f"{k}={v:0.4f}" for k, v in sorted(last.items())), flush=True)

        # encoder snapshot in Trainer.load_encoder format + QA head
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        host = jax.device_get(params)["params"]
        snap = {"lxrt": host["lxrt"]}
        path = os.path.join(os.path.abspath(cfg.output),
                            f"Epoch{epoch:02d}_LXRT")
        ckptr.save(path, snap, force=True)
        qa_fc2 = host["heads"]["qa_head"]["fc2"]["Dense_0"]
        np.savez(os.path.join(cfg.output, f"Epoch{epoch:02d}_qa_head.npz"),
                 weight=np.asarray(qa_fc2["kernel"]).T,
                 bias=np.asarray(qa_fc2["bias"]),
                 answers=np.array(
                     [table.id2ans[i] for i in range(len(table))]))
    print(f"pretraining done: {cfg.optim.epochs} epochs, "
          f"snapshots in {cfg.output}", flush=True)
    return last


if __name__ == "__main__":
    sys.exit(0 if main(sys.argv[1:]) is not None else 1)
