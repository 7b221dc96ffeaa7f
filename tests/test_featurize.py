import numpy as np

from shgvqa_tpu.data.featurize import (
    hg_segment_ids,
    hg_token_mask,
    pack_hg_labels,
    situation_causal_mask,
    uniform_subsample_indices,
)


def test_uniform_subsample_matches_reference_semantics():
    # torch.linspace(0, t-1, n).clamp(0, t-1).long() — nearest-floor behavior
    import torch

    for t, n in [(8, 16), (16, 16), (30, 16), (5, 4), (1, 4)]:
        ours = uniform_subsample_indices(t, n)
        ref = torch.clamp(torch.linspace(0, t - 1, n), 0, t - 1).long().numpy()
        np.testing.assert_array_equal(ours, ref)


def test_hg_segment_ids():
    seg = hg_segment_ids(4, 3)
    np.testing.assert_array_equal(
        seg, [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    )


def test_situation_causal_mask_blocks():
    m = situation_causal_mask(3, 2)
    assert m.shape == (6, 6)
    # within/below-diagonal situations are 0
    assert m[0, 0] == 0 and m[5, 0] == 0 and m[2, 3] == 0
    # future situations are -inf
    assert np.isneginf(m[0, 2]) and np.isneginf(m[3, 4])
    # row s*slots.. attends exactly to situations <= s
    for row in range(6):
        s = row // 2
        finite = ~np.isneginf(m[row])
        assert finite.sum() == (s + 1) * 2


def test_pack_hg_labels_pad_and_clamp():
    labels = [[5, 6, 7, 8, 9], [1], [2, 3]]
    out = pack_hg_labels(labels, num_situations=3, max_slots=3)
    np.testing.assert_array_equal(out["labels"], [[5, 6, 7], [1, 0, 0], [2, 3, 0]])
    # raw lengths 5,1,2 -> clamped to 3,1,2
    np.testing.assert_array_equal(out["lengths"], [3, 1, 2])


def test_pack_hg_labels_subsample():
    labels = [[i + 1] for i in range(8)]
    out = pack_hg_labels(labels, num_situations=4, max_slots=2)
    # linspace(0,7,4) = [0, 2.33, 4.67, 7] -> floor [0,2,4,7]
    np.testing.assert_array_equal(out["subsample_indices"], [0, 2, 4, 7])
    np.testing.assert_array_equal(out["labels"][:, 0], [1, 3, 5, 8])


def test_hg_token_mask_order_act_then_rel():
    act = np.array([[1, 0], [4, 2]])
    rel = np.array([[7, 0, 0], [1, 2, 3]])
    m = hg_token_mask(act, rel)
    np.testing.assert_array_equal(m, [[1, 0, 1, 0, 0], [1, 1, 1, 1, 1]])
