"""Offline visualization tools render from dump-format data.

Covers the rebuilt plot types of ``visualization_tools/qa_visualization.py``:
clip grid, situation-hypergraph table, attention heatmap, bbox overlay
(``Vis_Box``, :55-79) and pose overlay (``Vis_Pose`` + ``vis_keypoints``,
:82-101, vis_utils.py:63-97).
"""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")

from shgvqa_tpu.visualization.qa_visualization import (  # noqa: E402
    plot_attention,
    plot_boxes,
    plot_clip,
    plot_pose,
    plot_situation_hypergraph,
)


def _frames(t=4, h=32, w=32):
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (t, h, w, 3), np.uint8)


def _check(path):
    data = path.read_bytes()
    assert len(data) > 500
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_plot_clip(tmp_path):
    p = tmp_path / "clip.png"
    plot_clip(_frames(), str(p), title="clip")
    _check(p)


def test_plot_situation_hypergraph(tmp_path):
    p = tmp_path / "hg.png"
    plot_situation_hypergraph(
        rel_preds=np.array([[1, 0, 2], [3, 3, 0]]),
        act_preds=np.array([[1, 0], [0, 2]]),
        path=str(p),
        rel_names={1: "on", 2: "holding", 3: "near"},
        act_names={1: "sit", 2: "stand"},
        question="what is happening?",
        answer="sitting",
    )
    _check(p)


def test_plot_attention(tmp_path):
    p = tmp_path / "attn.png"
    plot_attention(np.random.RandomState(1).rand(2, 5, 7), str(p),
                   query_labels=[f"q{i}" for i in range(5)],
                   key_labels=[f"k{i}" for i in range(7)], title="x")
    _check(p)


def test_plot_boxes(tmp_path):
    p = tmp_path / "boxes.png"
    plot_boxes(
        _frames(),
        boxes=[[(2, 2, 20, 20), None], [(5, 5, 28, 28)], [], []],
        labels=[["person", "cup"], ["table"], [], []],
        path=str(p), title="boxes",
    )
    _check(p)


def test_plot_pose(tmp_path):
    p = tmp_path / "pose.png"
    rng = np.random.RandomState(2)
    # 14 joints as flat [x, y, conf] triplets; one frame without detection
    kp = []
    for t in range(4):
        if t == 2:
            kp.append(None)
            continue
        triplets = []
        for _ in range(14):
            triplets += [float(rng.uniform(0, 31)),
                         float(rng.uniform(0, 31)),
                         float(rng.randint(0, 2))]
        kp.append(triplets)
    plot_pose(_frames(), kp, str(p), title="pose")
    _check(p)


def test_visualize_qa_orchestrator(tmp_path, capsys):
    """The qa_visulization driver analog (qa_visualization.py:120-153):
    text sections print, frame-based plots render from a loader callback."""
    from shgvqa_tpu.visualization.qa_visualization import visualize_qa

    datum = {
        "question_id": "Interaction_T1_0",
        "video_id": "VID001",
        "question": "What did the person do?",
        "answer": "took the book",
        "choices": [{"choice": "took the book"}, {"choice": "sat down"}],
        "start": 1.0, "end": 3.0,
        "situations": {
            "000001": {"actions": ["a001"],
                       "rel_labels": ["r000"],
                       "rel_pairs": [["o000", "o001"]],
                       "bbox": [[2.0, 2.0, 20.0, 20.0]],
                       "bbox_labels": ["o000"]},
            "000002": {"actions": ["a000"],
                       "rel_labels": ["r001"],
                       "rel_pairs": [["o001", "o000"]],
                       "bbox": [[4.0, 4.0, 16.0, 24.0]],
                       "bbox_labels": ["o001"]},
        },
    }
    frames = _frames(t=2)
    visualize_qa(
        [datum],
        load_frames=lambda vid, ids: frames[:len(ids)],
        output_dir=str(tmp_path), max_show_num=2,
        act_cls={"a000": "look at book", "a001": "take book"},
        obj_vocab=["person", "book"], rel_vocab=["on", "behind"],
        pose_loader=lambda vid, f: [5, 5, 1.0, 9, 9, 1.0, 13, 5, 1.0],
        vis_meta=True, vis_q_a_o=True, vis_kf=True, vis_sg=True,
        vis_pose=True, vis_box=True)
    out = capsys.readouterr().out
    assert "QID: Interaction_T1_0" in out
    assert "took the book" in out
    assert "take book" in out
    assert "book  ----  behind  ----  person" in out.replace("   ", "  ")
    assert "person  ----  on  ----  book" in out.replace("   ", "  ")
    _check(tmp_path / "Interaction_T1_0_frames.png")
    _check(tmp_path / "Interaction_T1_0_pose.png")
    _check(tmp_path / "Interaction_T1_0_boxes.png")
