"""--parityEval reproduces the reference's drop_last=True eval loaders.

The reference's valid/test DataLoaders drop the last partial batch
(``agqaHGQA.py:74-78``), which is metric-affecting (SURVEY.md hard-parts #4).
The default here pads + keeps every item (data/pipeline.py); the flag opts
into the reference tail-drop so score comparisons against a reference run
see the same item set.  Also covers the real-data vocab hard-fail
(cli/common.py build_tokenizer): a run without vocab.txt must NOT silently
train on a corpus-built vocab unless explicitly opted in.
"""

import json

import pytest

from shgvqa_tpu.configs.cli import parse_reference_flags
from shgvqa_tpu.configs.config import tiny_test_config


def test_flag_parses():
    cfg = parse_reference_flags(["--taskQ", "--parityEval"], dataset="agqa")
    assert cfg.data.parity_eval
    cfg = parse_reference_flags(["--taskQ"], dataset="agqa")
    assert not cfg.data.parity_eval


def test_batcher_drop_last_drops_tail():
    from shgvqa_tpu.data.pipeline import Batcher

    items = [{"x": i} for i in range(9)]
    kept = Batcher(items, batch_size=2, shuffle=False, drop_last=False)
    dropped = Batcher(items, batch_size=2, shuffle=False, drop_last=True)
    assert len(kept) == 5 and len(dropped) == 4
    n_kept = sum(b["n_valid"] for b in kept.epoch(0))
    n_dropped = sum(b["n_valid"] for b in dropped.epoch(0))
    assert n_kept == 9 and n_dropped == 8


@pytest.mark.slow
def test_parity_eval_changes_scored_item_set(tmp_path):
    """Driver-level delta: the dumped prediction set shrinks to the full
    batches under --parityEval (the reference's behavior), and stays the
    whole split without it."""
    from shgvqa_tpu.cli.agqa_q import main

    base = ["--taskQ", "--test", "test", "--batchSize", "8",
            "--syntheticData", "9", "--numWorkers", "0",
            "--llayers", "1", "--fromScratch"]
    # agqa eval batch = batchSize//4 = 2; 9 items -> 4 full batches + 1 tail
    out_a = tmp_path / "keep"
    main(base + ["--output", str(out_a)])
    preds_keep = json.loads((out_a / "predict.json").read_text())

    out_b = tmp_path / "drop"
    main(base + ["--parityEval", "--output", str(out_b)])
    preds_drop = json.loads((out_b / "predict.json").read_text())

    assert len(preds_keep) == 9
    assert len(preds_drop) == 8


def test_vocab_hard_fails_on_real_data(tmp_path):
    from shgvqa_tpu.cli.common import build_tokenizer

    cfg = tiny_test_config()
    cfg = cfg.replace(data=cfg.data.__class__(data_dir=str(tmp_path)))
    with pytest.raises(SystemExit, match="vocab"):
        build_tokenizer(cfg, {}, ["a question"])
    # synthetic runs and the explicit opt-in still build one
    tok = build_tokenizer(cfg, {"synthetic_data": 8}, ["a question"])
    assert tok is not None
    (tmp_path / "vocab.txt").unlink()
    tok = build_tokenizer(cfg, {"build_vocab": True}, ["a question"])
    assert tok is not None
