"""slowfast input geometry: 256^2 frames -> 8x8 token grids end to end.

The reference's slowfast transforms resize to 256^2 (data_transforms.py:83,
119; crop_size=256 at :36), so slowfast features are (B, C, T, 8, 8) and the
visual token grid is 8x8 (513 tokens with CLS) instead of the 224^2 / 7x7
geometry of every other backbone.  Round-2 pinned image_size=224 globally —
these tests pin the per-backbone sizing + --imageSize override and prove the
grid flows through the tokenizer/mask geometry and the full CLI driver.
"""

import numpy as np
import pytest

from shgvqa_tpu.configs.cli import parse_reference_flags


def test_cli_derives_slowfast_geometry():
    cfg = parse_reference_flags(
        ["--taskHGQA", "--noCaps", "--backbone", "slowfast_r50"],
        dataset="agqa")
    assert cfg.data.image_size == 256
    assert cfg.encoder.visual_hw == 8
    assert cfg.encoder.visual_feat_dim == 2304
    assert cfg.encoder.visual_seq_length == 8 * 8 * 8 + 1  # 513

    cfg = parse_reference_flags(
        ["--taskHGQA", "--noCaps", "--backbone", "slowfast_r101"],
        dataset="agqa")
    assert cfg.data.image_size == 256 and cfg.encoder.visual_hw == 8

    cfg = parse_reference_flags(["--taskHGQA", "--noCaps"],
                                dataset="agqa")
    assert cfg.data.image_size == 224
    assert cfg.encoder.visual_hw == 7 and cfg.encoder.visual_feat_dim == 2048


def test_image_size_override():
    cfg = parse_reference_flags(
        ["--taskHGQA", "--noCaps", "--imageSize", "288"], dataset="agqa")
    assert cfg.data.image_size == 288
    assert cfg.encoder.visual_hw == 9
    cfg = parse_reference_flags(
        ["--taskHGQA", "--noCaps", "--backbone", "slowfast_r50",
         "--imageSize", "224"],
        dataset="agqa")
    assert cfg.data.image_size == 224 and cfg.encoder.visual_hw == 7


def test_slowfast_trunk_emits_8x8_grid():
    """Toy-width SlowFast on a 256^2 clip: (B, T, 8, 8, outs+outs/8)."""
    import jax

    from shgvqa_tpu.models.backbones_extra import SlowFastR50

    trunk = SlowFastR50(depths=(1, 1, 1, 1), stem_width=8,
                        mids=(8, 16, 32, 64), outs=(32, 64, 128, 256))
    x = np.random.RandomState(0).rand(1, 16, 256, 256, 3).astype(np.float32)
    var = trunk.init(jax.random.PRNGKey(0), x)
    out = trunk.apply(var, x)
    assert out.shape == (1, 16, 8, 8, 256 + 256 // 8)


def test_head_consumes_8x8_features():
    """ShgVqaModel at visual_hw=8: tokenizer + visual mask geometry holds."""
    import dataclasses

    import jax

    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.models.shgvqa import ShgVqaModel

    cfg = tiny_test_config(task="hgqa")
    enc = dataclasses.replace(cfg.encoder, visual_hw=8, visual_t=2,
                              visual_feat_dim=12)
    cfg = cfg.replace(encoder=enc)
    model = ShgVqaModel(cfg)
    rng = np.random.RandomState(1)
    b, lt = 2, cfg.data.max_seq_length
    s = cfg.data.num_situations
    t_in = enc.visual_t + 8
    batch = {
        "input_ids": rng.randint(1, 60, (b, lt)).astype(np.int32),
        "input_mask": np.ones((b, lt), np.int32),
        "segment_ids": np.zeros((b, lt), np.int32),
        "visual_feats": rng.rand(b, t_in, 8, 8, 12).astype(np.float32),
        "visual_mask": np.ones((b, enc.visual_seq_length), np.int32),
        "hg_mask": np.ones(
            (b, s, cfg.data.num_rel + cfg.data.num_act), np.int32),
    }
    out = model.apply(model.init(jax.random.PRNGKey(0), batch), batch)
    assert out["logit"].shape == (b, cfg.num_answers)
    assert out["rel_preds"].shape == (
        b, cfg.data.num_rel_queries, cfg.num_rel_classes + 1)


@pytest.mark.slow
def test_slowfast_cli_end_to_end(tmp_path):
    """Full driver at real slowfast dims: 256^2 synthetic frames through the
    actual SlowFastR50 trunk into the 513-token encoder (one tiny eval)."""
    from shgvqa_tpu.cli.agqa_hgqa import main

    main(["--taskVQA", "--noCaps", "--test", "test", "--batchSize", "4",
          "--syntheticData", "2", "--numWorkers", "0", "--fromScratch",
          "--backbone", "slowfast_r50",
          "--llayers", "1", "--xlayers", "1", "--rlayers", "1",
          "--output", str(tmp_path)])
    assert (tmp_path / "predict.json").exists()
