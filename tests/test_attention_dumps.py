"""--outputAttn per-question dumps (star.py:540-547 / agqaHGQA.py:561-605
semantics: val_attentions_cross_2.json + hg_val_attentions_cross_2.json with
the HGQ cross-encoder's last-layer CLS attention row and the
Hungarian-matched rel/act target grids)."""

import json
import os

import numpy as np


def test_dump_attentions_per_question(tmp_path):
    import dataclasses

    from shgvqa_tpu.cli.common import _ATTN_STREAM, _dump_attentions
    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.data.pipeline import Batcher
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.loop import Trainer
    from tests.test_train_loop import _make_items

    cfg = tiny_test_config(task="hgqa").replace(output=str(tmp_path))
    items = _make_items(cfg, n=5)
    batcher = Batcher(items, batch_size=2, shuffle=False, seed=0)
    trainer = Trainer(cfg, steps_per_epoch=1, model=ShgVqaModel(cfg))
    ex = dict(next(batcher.epoch(0)))
    ex.pop("ques_id"), ex.pop("n_valid", None)
    trainer.init_params(ex)

    _dump_attentions(cfg, trainer, batcher, max_batches=2)

    # reference filenames, under --output (star.py:544-545; written
    # correctly, unlike the shipped 'wb' save_json)
    with open(tmp_path / "val_attentions_cross_2.json") as f:
        results = json.load(f)
    with open(tmp_path / "hg_val_attentions_cross_2.json") as f:
        hg_results = json.load(f)
    # 2 batches x 2 questions, each with its OWN attention rows
    assert [r["questionId"] for r in results] == [
        it["ques_id"] for it in items[:4]]
    assert [r["questionId"] for r in hg_results] == [
        it["ques_id"] for it in items[:4]]

    e = cfg.encoder
    d = cfg.data
    # xl stream: lang-CLS query row over the HG sequence (CLS + S*(act+rel))
    hg_len = 1 + d.num_situations * (d.num_act + d.num_rel)
    for r, hr in zip(results, hg_results):
        a = np.asarray(r["attention"])
        assert a.shape[0] == e.num_heads
        if _ATTN_STREAM[e.cross_attn_type] == "xl":
            assert a.shape[1] == hg_len
        assert isinstance(r["prediction"], int)
        assert isinstance(hr["prediction"], int)
        # hg entries carry the same attention scores (agqaHGQA.py:599-605)
        assert hr["attention"] == r["attention"]
        # Hungarian-matched grids (get_target_classes layout b x S x Q/S)
        rel_pred = np.asarray(r["rel_pred"])
        act_pred = np.asarray(r["act_pred"])
        assert rel_pred.shape == (d.num_situations,
                                  d.num_rel_queries // d.num_situations)
        assert act_pred.shape == (d.num_situations,
                                  d.num_act_queries // d.num_situations)
        assert np.asarray(r["rel_gt"]).shape == (d.num_situations, d.num_rel)
        assert np.asarray(r["act_gt"]).shape == (d.num_situations, d.num_act)
        # matched grid entries are class ids (background 0 allowed)
        assert rel_pred.min() >= 0
        assert rel_pred.max() <= cfg.num_rel_classes

    # attention rows differ across questions (not the whole-batch copy bug)
    a0 = np.asarray(results[0]["attention"])
    a1 = np.asarray(results[1]["attention"])
    assert not np.allclose(a0, a1)
    assert (tmp_path / "attentions" / "batch000.npz").exists()


def test_dump_attentions_label_free_test_split(tmp_path):
    """Test-split items carry no HG labels (agqa_data.py:223-227); the dump
    must skip the matched grids instead of KeyErroring."""
    from shgvqa_tpu.cli.common import _dump_attentions
    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.data.pipeline import Batcher
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.loop import Trainer
    from tests.test_train_loop import _make_items

    cfg = tiny_test_config(task="hgqa").replace(output=str(tmp_path))
    items = _make_items(cfg, n=2)
    for it in items:
        for k in ("rel_labels", "rel_lengths", "act_labels", "act_lengths"):
            it.pop(k, None)
    batcher = Batcher(items, batch_size=2, shuffle=False, seed=0)
    trainer = Trainer(cfg, steps_per_epoch=1, model=ShgVqaModel(cfg))
    ex = dict(next(batcher.epoch(0)))
    ex.pop("ques_id"), ex.pop("n_valid", None)
    trainer.init_params(ex)

    _dump_attentions(cfg, trainer, batcher, max_batches=1)

    with open(tmp_path / "val_attentions_cross_2.json") as f:
        results = json.load(f)
    assert len(results) == 2
    assert "rel_pred" not in results[0]
    assert results[0]["attention"]
