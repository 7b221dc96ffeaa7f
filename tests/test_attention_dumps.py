"""--outputAttn per-question dumps (agqaHGQA.py:561-605 semantics)."""

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

    out_dir = tmp_path / "attentions"
    with open(out_dir / "results.json") as f:
        results = json.load(f)
    # 2 batches x 2 questions, each with its OWN attention rows
    assert [r["questionId"] for r in results] == [
        it["ques_id"] for it in items[:4]]
    e = cfg.encoder
    lk = e.visual_seq_length if _ATTN_STREAM[
        e.cross_attn_type] == "xl" else None
    for r in results:
        a = np.asarray(r["attention"])
        assert a.shape[0] == e.num_heads
        if lk is not None:
            assert a.shape[1] == lk
        assert isinstance(r["prediction"], int)
    # attention rows differ across questions (not the whole-batch copy bug)
    a0 = np.asarray(results[0]["attention"])
    a1 = np.asarray(results[1]["attention"])
    assert not np.allclose(a0, a1)
    assert (out_dir / "batch000.npz").exists()
