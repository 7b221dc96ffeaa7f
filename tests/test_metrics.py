"""Golden tests for the AGQA/STAR metric suites on hand-computed fixtures."""

import json

import pytest

from shgvqa_tpu.data.synthetic import make_agqa_data, make_star_data
from shgvqa_tpu.evalsuite.agqa import (
    AGQA_ALL_QTYPES_NAMES,
    AGQA_INDIRECT_NAMES,
    AGQA_NOVEL_COMP_NAMES,
    AGQAEvaluator,
)
from shgvqa_tpu.evalsuite.star import STAREvaluator


def _tiny_fixture():
    vocab = {"yes": 0, "no": 1, "red": 2}
    datums = {
        "q0": {
            "question_id": "q0", "question": "a?", "answer": "yes",
            "ans_type": "binary", "global": ["obj-rel", "exists"],
            "semantic": "object", "structural": "query",
            "nc_seq": 1, "nc_sup": 0, "nc_dur": 0, "nc_objrel": 0,
            "i_obj": 1, "i_act": 0, "i_temp": 0,
            "indirect": 1, "direct_equiv": "q1",
            "steps": 2, "more_steps": 0,
        },
        "q1": {
            "question_id": "q1", "question": "b?", "answer": "no",
            "ans_type": "binary", "global": ["obj-rel"],
            "semantic": "object", "structural": "verify",
            "nc_seq": 0, "nc_sup": 1, "nc_dur": 0, "nc_objrel": 0,
            "i_obj": 0, "i_act": 1, "i_temp": 0,
            "indirect": 0, "direct_equiv": None,
            "steps": 1, "more_steps": 0,
        },
        "q2": {
            "question_id": "q2", "question": "c?", "answer": "red",
            "ans_type": "open", "global": ["sequencing", "sequencing"],
            "semantic": "relation", "structural": "choose",
            "nc_seq": 0, "nc_sup": 0, "nc_dur": 1, "nc_objrel": 1,
            "i_obj": 1, "i_act": 0, "i_temp": 1,
            "indirect": 0, "direct_equiv": None,
            "steps": 3, "more_steps": 1,
        },
    }
    # predictions: q0 correct (yes=0), q1 wrong (yes=0 vs no), q2 correct (red=2)
    quesid2ans = {"q0": 0, "q1": 0, "q2": 2}
    return datums, vocab, quesid2ans


def test_overall():
    datums, vocab, q2a = _tiny_fixture()
    ev = AGQAEvaluator(datums, vocab)
    assert ev.evaluate_overall(q2a) == pytest.approx(2 / 3)


def test_all_qtypes_vector():
    datums, vocab, q2a = _tiny_fixture()
    ev = AGQAEvaluator(datums, vocab)
    v = dict(zip(AGQA_ALL_QTYPES_NAMES, ev.evaluate_all_qtypes(q2a)))
    assert v["overall"] == pytest.approx(2 / 3)
    assert v["overall/binary"] == pytest.approx(1 / 2)
    assert v["overall/open"] == pytest.approx(1.0)
    # obj-rel: q0 correct, q1 wrong -> 1/2 (both binary)
    assert v["reasoning/obj-rel"] == pytest.approx(1 / 2)
    assert v["reasoning/obj-rel/binary"] == pytest.approx(1 / 2)
    assert v["reasoning/obj-rel/open"] == 0.0
    # sequencing tag appears twice on q2 -> counted twice, both correct
    assert v["reasoning/sequencing"] == pytest.approx(1.0)
    assert v["reasoning/exists"] == pytest.approx(1.0)
    # semantics
    assert v["semantic/object"] == pytest.approx(1 / 2)
    assert v["semantic/relation"] == pytest.approx(1.0)
    # structural
    assert v["structural/query"] == pytest.approx(1.0)
    assert v["structural/verify"] == 0.0
    assert v["structural/choose"] == pytest.approx(1.0)
    assert len(AGQA_ALL_QTYPES_NAMES) == 31


def test_comp_steps_vector():
    datums, vocab, q2a = _tiny_fixture()
    ev = AGQAEvaluator(datums, vocab)
    assert ev.evaluate_comp_steps(q2a) == pytest.approx([2 / 3, 1 / 2, 1.0])


def test_novel_comp_vector():
    datums, vocab, q2a = _tiny_fixture()
    ev = AGQAEvaluator(datums, vocab)
    v = dict(zip(AGQA_NOVEL_COMP_NAMES, ev.evaluate_novel_comp(q2a)))
    assert v["overall"] == pytest.approx(2 / 3)
    assert v["nc_seq"] == pytest.approx(1.0)      # only q0, correct
    assert v["nc_sup"] == 0.0                     # only q1, wrong
    assert v["nc_dur"] == pytest.approx(1.0)      # only q2
    assert v["nc_objrel/open"] == pytest.approx(1.0)
    assert len(AGQA_NOVEL_COMP_NAMES) == 15


def test_indirect_ref_and_precision():
    datums, vocab, q2a = _tiny_fixture()
    ev = AGQAEvaluator(datums, vocab)
    recall, precision_qs = ev.evaluate_indirect_ref(q2a)
    v = dict(zip(AGQA_INDIRECT_NAMES, recall))
    # i_obj: q0 correct, q2 correct -> 1.0
    assert v["i_obj"] == pytest.approx(1.0)
    # i_act: q1 wrong -> 0
    assert v["i_act"] == 0.0
    assert v["i_temp"] == pytest.approx(1.0)
    # q0 is indirect with twin q1; q1 was answered WRONG -> no precision entry
    assert precision_qs == []
    # flip: make q1 correct
    q2a2 = dict(q2a, q1=1)
    _, precision_qs2 = ev.evaluate_indirect_ref(q2a2)
    assert len(precision_qs2) == 1 and precision_qs2[0]["prediction"] == "yes"
    prec = ev.evaluate_precision(precision_qs2)
    pv = dict(zip(AGQA_INDIRECT_NAMES, prec))
    assert pv["i_obj"] == pytest.approx(1.0)


def test_oracle_score_is_one():
    datums, vocab, _ = _tiny_fixture()
    ev = AGQAEvaluator(datums, vocab)
    assert ev.oracle_score(datums.keys()) == pytest.approx(1.0)


def test_dump_result_roundtrip(tmp_path):
    datums, vocab, q2a = _tiny_fixture()
    ev = AGQAEvaluator(datums, vocab)
    p = tmp_path / "preds.json"
    ev.dump_result(q2a, p)
    data = json.loads(p.read_text())
    assert len(data) == 3
    assert {d["id"] for d in data} == {"q0", "q1", "q2"}
    p2 = tmp_path / "preds_ir.json"
    ev.dump_result(q2a, p2, indirect_ref=True)
    data2 = json.loads(p2.read_text())
    assert all("directEq" in d for d in data2)


def test_synthetic_agqa_full_suite_runs():
    datums, vocab, _, _, _ = make_agqa_data(n=24)
    id2datum = {d["question_id"]: d for d in datums}
    ev = AGQAEvaluator(id2datum, vocab)
    q2a = {d["question_id"]: 0 for d in datums}
    assert len(ev.evaluate_all_qtypes(q2a)) == 31
    assert len(ev.evaluate_novel_comp(q2a)) == 15
    assert len(ev.evaluate_comp_steps(q2a)) == 3
    recall, pqs = ev.evaluate_indirect_ref(q2a)
    assert len(recall) == 9
    assert len(ev.evaluate_precision(pqs)) == 9
    assert ev.oracle_score(id2datum.keys()) == pytest.approx(1.0)


def test_star_evaluator():
    datums, _ = make_star_data(n=16)
    id2datum = {d["question_id"]: d for d in datums}
    ev = STAREvaluator(id2datum)
    # all-zero predictions
    q2a = {qid: 0 for qid in id2datum}
    acc = ev.evaluate(q2a)
    expected = sum(1 for d in datums if d["answer_choice"] == 0) / len(datums)
    assert acc == pytest.approx(expected)
    by_type = ev.evaluate_by_qtype(q2a)
    assert set(by_type) == {"Interaction", "Sequence", "Prediction", "Feasibility"}
    assert ev.oracle_score(id2datum.keys()) == pytest.approx(1.0)


def test_star_dump(tmp_path):
    datums, _ = make_star_data(n=4)
    id2datum = {d["question_id"]: d for d in datums}
    ev = STAREvaluator(id2datum)
    p = tmp_path / "star.json"
    ev.dump_result({qid: 1 for qid in id2datum}, p)
    data = json.loads(p.read_text())
    assert all(d["prediction"] == 1 for d in data)
