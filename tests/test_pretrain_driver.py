"""LXMERT pretraining driver + load_lxmert_qa end-to-end
(pretrain/lxmert_pretrain.py + qa_answer_table.py:84-158 rebuilt)."""

import os

import numpy as np
import pytest


def _run_pretrain(tmp_path, extra_flags=()):
    from shgvqa_tpu.cli.pretrain import main

    argv = [
        "--train", "train", "--llayers", "2", "--xlayers", "2",
        "--rlayers", "2", "--batchSize", "4", "--epochs", "2",
        "--lr", "1e-3", "--syntheticData", "12",
        "--output", str(tmp_path / "pre"),
        *extra_flags,
    ]
    return main(argv)


def test_pretrain_driver_runs_and_snapshot_loads(tmp_path, monkeypatch):
    import dataclasses

    import shgvqa_tpu.configs.cli as cli_mod
    from shgvqa_tpu.configs.config import tiny_test_config

    # force tiny dims: wrap the parser (pretrain.py resolves the symbol from
    # configs.cli at call time) to shrink encoder/decoder/data
    orig = cli_mod.parse_reference_flags_with_extras

    def tiny_parse(argv=None, dataset=None):
        cfg, extras = orig(argv, dataset)
        t = tiny_test_config()
        cfg = cfg.replace(
            encoder=dataclasses.replace(
                t.encoder, l_layers=2, x_layers=2, r_layers=2),
            decoder=t.decoder,
            data=dataclasses.replace(
                cfg.data, max_seq_length=t.data.max_seq_length),
        )
        return cfg, extras

    monkeypatch.setattr(cli_mod, "parse_reference_flags_with_extras",
                        tiny_parse)
    metrics = _run_pretrain(tmp_path, ("--taskMaskLM", "--taskMatched",
                                       "--taskQA", "--taskContrastive",
                                       "--taskObjPredict"))
    assert np.isfinite(metrics["total_loss"])
    for k in ("lm_loss", "matched_loss", "qa_loss", "contrastive_loss",
              "visn_loss"):
        assert k in metrics

    out = tmp_path / "pre"
    snaps = sorted(p for p in os.listdir(out) if p.endswith("_LXRT"))
    assert snaps, os.listdir(out)
    assert (out / "Epoch01_qa_head.npz").exists()


def test_answer_head_surgery():
    from shgvqa_tpu.models.pretrain import AnswerTable, answer_head_surgery

    table = AnswerTable(["cat", "a dog", "The Table.", "open"])
    d = 6
    rng = np.random.RandomState(0)
    ans_w = rng.randn(len(table), d).astype(np.float32)
    ans_b = rng.randn(len(table)).astype(np.float32)
    model_w = np.ones((5, d), np.float32)
    model_b = np.ones((5,), np.float32)
    label2ans = {0: "dog", 1: "CAT", 2: "unknownthing", 3: "table",
                 4: "close"}
    new_w, new_b, loaded, unloaded = answer_head_surgery(
        ans_w, ans_b, model_w, model_b, label2ans, table)
    assert (loaded, unloaded) == (3, 2)
    np.testing.assert_array_equal(new_w[0], ans_w[table.convert("dog")])
    np.testing.assert_array_equal(new_w[1], ans_w[table.convert("cat")])
    np.testing.assert_array_equal(new_w[3], ans_w[table.convert("table")])
    assert (new_w[2] == 0).all() and new_b[2] == 0
    assert (new_w[4] == 0).all() and new_b[4] == 0


def test_load_lxmert_qa_end_to_end(tmp_path, monkeypatch):
    """Pretrain -> snapshot -> fine-tune Trainer.load_lxmert_qa: encoder
    restored, answer head rows surgically initialized by answer string."""
    import dataclasses

    import jax
    import shgvqa_tpu.configs.cli as cli_mod
    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.data.pipeline import stack_items
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.loop import Trainer
    from tests.test_train_loop import _make_items

    orig = cli_mod.parse_reference_flags_with_extras

    def tiny_parse(argv=None, dataset=None):
        cfg, extras = orig(argv, dataset)
        t = tiny_test_config()
        cfg = cfg.replace(encoder=t.encoder, decoder=t.decoder,
                          data=dataclasses.replace(
                              cfg.data,
                              max_seq_length=t.data.max_seq_length))
        return cfg, extras

    monkeypatch.setattr(cli_mod, "parse_reference_flags_with_extras",
                        tiny_parse)
    _run_pretrain(tmp_path)
    snap = str(tmp_path / "pre" / "Epoch01_LXRT")

    cfg = tiny_test_config(task="vqa")
    trainer = Trainer(cfg, steps_per_epoch=1, model=ShgVqaModel(cfg))
    batch = stack_items(_make_items(cfg, n=2))
    batch.pop("ques_id", None)
    trainer.init_params(batch)
    p0 = jax.device_get(trainer.params)
    emb0 = np.asarray(p0["params"]["lxrt"]["embeddings"]["word_embeddings"]
                      ["embedding"]).copy()

    # label2ans: ans0/ans1 exist in pretraining answers, 'neverseen' not
    label2ans = {i: f"ans{i}" for i in range(cfg.num_answers)}
    label2ans[cfg.num_answers - 1] = "neverseen"
    trainer.load_lxmert_qa(snap, label2ans)

    p1 = jax.device_get(trainer.params)
    emb1 = np.asarray(p1["params"]["lxrt"]["embeddings"]["word_embeddings"]
                      ["embedding"])
    assert not np.array_equal(emb0, emb1)  # encoder restored from snapshot
    head = p1["params"]["logit_fc"]["fc2"]["Dense_0"]
    w = np.asarray(head["kernel"]).T
    assert (w[cfg.num_answers - 1] == 0).all()     # unseen answer zeroed
    assert np.abs(w[0]).sum() > 0                  # pretrained row loaded
