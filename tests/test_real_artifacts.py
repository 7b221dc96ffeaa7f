"""Integration tests against the REAL reference data artifacts.

The reference tree ships the actual STAR label dictionaries
(``/root/reference/data/relationship_triplets.json`` and
``action_dictionaries.json`` -- pickles despite the .json names, loaded via
``src.utils.load_pickle`` at ``agqa_data.py:111,119``), the class-description
files (``data/action_classes.txt`` etc., ``AGQA/annotations/*.txt``), and the
Prediction/Feasibility augmentation video list
(``nopred_nofeas_vid_ids_train.json``).  These tests load the real bytes
through our loaders so schema assumptions (tuple-keyed ``rel_triplets_rp2idx``
etc.) are verified against ground truth rather than guessed.
"""

import os

import numpy as np
import pytest

REF_DATA = "/root/reference/data"
REF_AGQA_ANN = "/root/reference/AGQA/annotations"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not present")


def _rel_dict():
    from shgvqa_tpu.utils import load_json_or_pickle
    return load_json_or_pickle(
        os.path.join(REF_DATA, "relationship_triplets.json"))


def _act_dict():
    from shgvqa_tpu.utils import load_json_or_pickle
    return load_json_or_pickle(
        os.path.join(REF_DATA, "action_dictionaries.json"))


def test_relationship_triplets_pickle_schema():
    rel = _rel_dict()  # pickle sniffing must kick in despite .json name
    assert set(rel) == {"rel_triplets", "rel_triplets_lbls",
                        "rel_triplets_idx2rp", "rel_triplets_rp2idx"}
    rp2idx = rel["rel_triplets_rp2idx"]
    assert len(rel["rel_triplets"]) == 563  # STAR rel classes (star.py:90)
    assert len(rp2idx) == 563
    # tuple keys (o, r, o), 1-based contiguous indices (0 = background)
    key = next(iter(rp2idx))
    assert isinstance(key, tuple) and len(key) == 3
    assert sorted(rp2idx.values()) == list(range(1, 564))
    # rp2idx is enumerate(rel_triplets, start=1) and idx2rp is its inverse
    assert all(rp2idx[t] == i + 1
               for i, t in enumerate(rel["rel_triplets"]))
    assert all(rel["rel_triplets_idx2rp"][v] == k for k, v in rp2idx.items())


def test_action_dictionaries_pickle_schema():
    act = _act_dict()
    rp2idx = act["actions_rp2idx"]
    assert len(rp2idx) == 111  # STAR action classes (star.py:85)
    assert rp2idx["a000"] == 1
    assert sorted(rp2idx.values()) == list(range(1, 112))
    assert all(act["actions_idx2rp"][v] == k for k, v in rp2idx.items())


def test_get_action_dictionaries_reproduces_pickle():
    """Our vocab builder over the real action_classes.txt must reproduce the
    shipped actions_rp2idx exactly (vis_utils.get_action_dictionaries)."""
    from shgvqa_tpu.data.vocab import get_act_cls, get_action_dictionaries

    classes = get_act_cls(REF_DATA)
    assert len(classes) == 111
    assert classes["a000"] == "hold some clothes"
    built = get_action_dictionaries(classes)
    assert built["actions_rp2idx"] == _act_dict()["actions_rp2idx"]


def test_agqa_annotation_class_files():
    from shgvqa_tpu.data.vocab import get_act_cls, get_vocab, get_vocab_dict

    agqa_actions = get_act_cls(REF_AGQA_ANN)
    assert len(agqa_actions) == 157  # AGQA action classes (BASELINE.md)
    assert next(iter(agqa_actions)) == "c000"
    objs, rels, verbs = get_vocab(REF_AGQA_ANN)
    assert len(objs) == 39 and len(rels) == 26 and len(verbs) == 31
    assert objs[0] == "person" and rels[0] == "looking_at"
    objs_s, rels_s, verbs_s = get_vocab(REF_DATA)
    assert len(objs_s) == 37 and len(rels_s) == 24
    od, rd, vd = get_vocab_dict(REF_DATA)
    assert od["o000"] == "person" and rd["r000"] == "on"


def test_augmentation_video_list_loads_as_json():
    from shgvqa_tpu.utils import load_json_or_pickle

    vids = load_json_or_pickle(
        os.path.join(REF_DATA, "nopred_nofeas_vid_ids_train.json"))
    assert isinstance(vids, list) and len(vids) == 1503
    assert all(isinstance(v, str) for v in vids[:10])


def test_star_vocab_extraction_matches_from_files_guess():
    """from_files pulls vocabs via rel.get('rel_triplets_rp2idx', rel) /
    act.get('actions_rp2idx', act) (data/star.py) -- verify the .get branch
    actually fires on the real dicts."""
    rel, act = _rel_dict(), _act_dict()
    assert rel.get("rel_triplets_rp2idx", rel) is rel["rel_triplets_rp2idx"]
    assert act.get("actions_rp2idx", act) is act["actions_rp2idx"]


def test_situation_tokenization_with_real_vocabs():
    """Route a STAR-schema datum built from REAL triplets through
    STARData + STARItemSource and check the label ids come back as the
    pickle's indices (reference semantics star_data.py:277-291)."""
    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.data.star import STARData, STARItemSource
    from shgvqa_tpu.data.tokenization import (
        BertTokenizer,
        build_vocab_from_corpus,
    )

    rel, act = _rel_dict(), _act_dict()
    rp2idx = rel["rel_triplets_rp2idx"]
    idx2rp = rel["rel_triplets_idx2rp"]
    act_idx2rp = act["actions_idx2rp"]

    # two situations drawn from the real dictionaries
    chosen_rel = [1, 2, 563], [4, 5]
    chosen_act = [1, 111], [7]
    situations = {}
    for f, (ridx, aidx) in enumerate(zip(chosen_rel, chosen_act)):
        trips = [idx2rp[i] for i in ridx]
        situations[f"{f:06d}"] = {
            "rel_pairs": [[t[0], t[2]] for t in trips],
            "rel_labels": [t[1] for t in trips],
            "actions": [act_idx2rp[i] for i in aidx],
        }
    datum = {
        "question_id": "Interaction_T1_0",
        "question": "What did the person do?",
        "video_id": "VID01",
        "choices": [{"choice_id": i, "choice": f"choice {i}"}
                    for i in range(4)],
        "answer_choice": 2,
        "situations": situations,
        "start": 0.0,
        "end": 2.0,
    }

    cfg = tiny_test_config(task="hgqa")
    import dataclasses
    cfg = cfg.replace(
        num_rel_classes=563, num_act_classes=111,
        data=dataclasses.replace(cfg.data, num_situations=4,
                                 qtype="Interaction"))
    data = STARData("train", [datum], cfg,
                    rel_vocab=rp2idx, act_vocab=act["actions_rp2idx"])
    import tempfile
    vocab_path = os.path.join(tempfile.mkdtemp(), "vocab.txt")
    build_vocab_from_corpus([datum["question"]], vocab_path)
    tok = BertTokenizer(vocab_path)
    src = STARItemSource(data, tok, cfg)
    item = src[0]

    # uniform_subsample of 2 situations to 4 repeats each frame twice
    assert item["rel_labels"].shape == (4, cfg.data.num_rel)
    assert list(item["rel_labels"][0][:3]) == [1, 2, 563]
    assert list(item["rel_labels"][-1][:2]) == [4, 5]
    assert list(item["act_labels"][0][:2]) == [1, 111]
    assert list(item["act_labels"][-1][:1]) == [7]
    assert int(item["rel_lengths"][0]) == 3
    assert int(item["act_lengths"][-1]) == 1
    assert int(np.argmax(item["target"])) == 2


def test_create_relationship_data_bijection_on_real_triplets():
    """create_relationship_data over datums synthesized from the real
    triplet inventory rebuilds a 1-based bijection with tuple keys."""
    from shgvqa_tpu.data.vocab import create_relationship_data

    rel = _rel_dict()
    trips = rel["rel_triplets"]
    datums = [{
        "situations": {
            "000000": {
                "rel_pairs": [[t[0], t[2]] for t in trips],
                "rel_labels": [t[1] for t in trips],
            }
        }
    }]
    built = create_relationship_data(datums)
    assert built["rel_triplets_rp2idx"] == rel["rel_triplets_rp2idx"]
    assert built["rel_triplets_idx2rp"] == rel["rel_triplets_idx2rp"]
