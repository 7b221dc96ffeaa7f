"""Dataset layer: file round-trips, protocol filters, STAR merge/trim."""

import json
import os

import numpy as np
import pytest

from shgvqa_tpu.configs.config import tiny_test_config
from shgvqa_tpu.data import synthetic as synth
from shgvqa_tpu.data.agqa import AGQAData, AGQAItemSource
from shgvqa_tpu.data.star import (
    QA_ARRANGERS,
    STARData,
    STARItemSource,
    get_merged_data,
    sample_frames,
    trim_keyframes,
)
from shgvqa_tpu.data.tokenization import BertTokenizer, build_vocab_from_corpus
from shgvqa_tpu.utils.io import save_json, save_pickle


@pytest.fixture()
def agqa_files(tmp_path):
    cfg = tiny_test_config()
    datums, vocab, trip, acts, fids = synth.make_agqa_data(
        n=20, num_rel_classes=cfg.num_rel_classes,
        num_act_classes=cfg.num_act_classes,
        max_rel=cfg.data.num_rel, max_act=cfg.data.num_act)
    save_json(datums, tmp_path / "train_balanced.json")
    # exercise the pickle-disguised-as-json quirk on one artifact
    save_pickle(vocab, tmp_path / "trainVal_vocab.json")
    save_json(trip, tmp_path / "frameTriplets.json")
    save_json(acts, tmp_path / "frameActions.json")
    save_json(fids, tmp_path / "trimmed_frame_ids.json")
    cfg = cfg.replace(data=cfg.data.__class__(
        **{**cfg.data.__dict__, "data_dir": str(tmp_path)}))
    return cfg, datums


def test_agqa_from_files_roundtrip(agqa_files):
    cfg, datums = agqa_files
    data = AGQAData.from_files(cfg, "train")
    assert len(data) == len(datums)
    assert data.num_answers == len(data.answer_vocab)
    assert data.evaluator().oracle_score(data.id2datum.keys()) == 1.0


def test_agqa_item_source_features(agqa_files, tmp_path):
    cfg, _ = agqa_files
    data = AGQAData.from_files(cfg, "train")
    vpath = tmp_path / "vocab.txt"
    build_vocab_from_corpus([x["question"] for x in data.datums], vpath)
    tok = BertTokenizer(vpath)
    src = AGQAItemSource(data, tok, cfg)
    item = src[0]
    d = cfg.data
    assert item["rel_labels"].shape == (d.num_situations, d.num_rel)
    assert item["hg_mask"].shape == (d.num_situations, d.num_act + d.num_rel)
    assert item["target"].sum() == 1.0
    assert (item["rel_labels"] >= 0).all()
    # hg_mask agrees with label grid nonzeros
    np.testing.assert_array_equal(
        item["hg_mask"][:, d.num_act:], (item["rel_labels"] > 0).astype(int))


def test_agqa_novel_comp_filter():
    cfg = tiny_test_config()
    dc = cfg.data.__class__(**{**cfg.data.__dict__, "novel_comp": True})
    cfg_nc = cfg.replace(data=dc)
    train = AGQAData.synthetic(cfg_nc, "train", n=40)
    valid = AGQAData.synthetic(cfg_nc, "valid", n=40)
    assert all(x["novel_comp"] == 0 for x in train.datums)
    assert all(x["novel_comp"] == 1 for x in valid.datums)


def test_star_qtype_filter_and_augment():
    cfg = tiny_test_config()
    datums, _ = synth.make_star_data(n=40)
    dc = cfg.data.__class__(**{**cfg.data.__dict__, "qtype": "Prediction"})
    cfg_p = cfg.replace(data=dc)
    aug_vids = {datums[0]["video_id"]}
    data = STARData("train", datums, cfg_p, augment_vid_ids=aug_vids)
    qtypes = {x["question_id"].split("_")[0] for x in data.datums}
    # Prediction questions plus augmentation questions from flagged videos
    assert "Prediction" in qtypes
    non_pred = [x for x in data.datums
                if not x["question_id"].startswith("Prediction")]
    assert all(x["video_id"] in aug_vids for x in non_pred)
    # eval split: no augmentation
    data_eval = STARData("valid", datums, cfg_p, augment_vid_ids=aug_vids)
    assert all(x["question_id"].startswith("Prediction")
               for x in data_eval.datums)


def test_star_merge_deleak():
    datums, _ = synth.make_star_data(n=40, n_videos=4)
    merged = get_merged_data(datums)
    pf_vids = {d["video_id"] for d in merged["Prediction"]} | {
        d["video_id"] for d in merged["Feasibility"]}
    for qtype in ("Interaction", "Sequence"):
        assert all(d["video_id"] not in pf_vids for d in merged[qtype])


def test_sample_frames_stride():
    fids = [f"{i:03d}" for i in range(33)]
    out = sample_frames(fids, 16)
    # interval = 33 // 16 = 2 -> every other frame (17 frames)
    assert out == fids[::2]
    assert sample_frames(fids, 0) == fids


def test_trim_keyframes_sorted():
    datum = {"situations": {f"{i:06d}": {} for i in (5, 1, 3)}}
    out = trim_keyframes(datum, 16)
    assert out == ["000001", "000003", "000005"]


def test_qa_arrangers_match_reference_format():
    q = "what happened?"
    ch = {"0": "took", "1": "put"}
    assert QA_ARRANGERS["add_sep_all"](q, ch) == \
        "what happened? [SEP]  0: took [SEP]  1: put [SEP]"
    assert QA_ARRANGERS["no_sep_all"](q, ch) == \
        "what happened?  0: took  1: put"
    per = QA_ARRANGERS["add_sep"](q, ch)
    assert per["qa0"] == "what happened? [SEP] 0: took"


def test_star_item_source(tmp_path):
    cfg = tiny_test_config()
    data = STARData.synthetic(cfg, "train", n=12)
    vpath = tmp_path / "v.txt"
    build_vocab_from_corpus([x["question"] for x in data.datums], vpath)
    tok = BertTokenizer(vpath)
    src = STARItemSource(data, tok, cfg)
    item = src[0]
    assert item["target"].shape == (4,)
    assert item["target"].sum() == 1.0
    assert 0 <= int(item["answer_idx"]) < 4
