from shgvqa_tpu.configs.cli import parse_reference_flags
from shgvqa_tpu.configs.config import Config, tiny_test_config


def test_default_config_validates():
    cfg = Config()
    cfg.validate()
    assert cfg.data.num_rel_queries == 128
    assert cfg.data.num_act_queries == 48
    assert cfg.encoder.visual_seq_length == 393


def test_tiny_config():
    cfg = tiny_test_config()
    assert cfg.encoder.hidden_size == 32
    assert cfg.data.num_rel_queries % cfg.data.clip_len == 0


def test_reference_published_agqa_command():
    # README.md:157-165 style invocation
    argv = (
        "--train train --valid valid --llayers 5 --xlayers 2 --rlayers 5 "
        "--dlayers 5 --noCaps --crossAttnType cross --batchSize 32 "
        "--optim bert --lr 1e-5 --epochs 100 --taskHGQA --fromScratch "
        "--LossHGPerFrame --augmentType rand_aug --backbone slow_r50 "
        "--output snap/agqa_hgqa --seed 9595"
    ).split()
    cfg = parse_reference_flags(argv, dataset="agqa")
    assert cfg.task == "hgqa"
    assert cfg.encoder.l_layers == 5 and cfg.encoder.x_layers == 2
    assert cfg.optim.batch_size == 32 and cfg.optim.lr == 1e-5
    assert cfg.loss_hg_per_frame and cfg.from_scratch
    assert cfg.num_rel_classes == 456 and cfg.num_act_classes == 157
    assert cfg.data.augment_type == "rand_aug"


def test_reference_published_star_command():
    argv = (
        "--train train --valid valid --llayers 5 --xlayers 2 --rlayers 5 "
        "--batchSize 8 --taskHGQA --useHGMask --qType Interaction "
        "--qaArrangeType add_sep_all --fromScratch"
    ).split()
    cfg = parse_reference_flags(argv, dataset="star")
    assert cfg.data.dataset == "star"
    assert cfg.num_rel_classes == 563 and cfg.num_act_classes == 111
    assert cfg.num_answers == 4
    assert cfg.use_hg_mask
    assert cfg.freeze_backbone  # star.py:87-88 freezes explicitly


def test_task_resolution_precedence():
    assert parse_reference_flags(["--taskQ"]).task == "q"
    assert parse_reference_flags(["--taskVQA"]).task == "vqa"
    assert parse_reference_flags(["--taskVHGA"]).task == "vhga"
    assert parse_reference_flags(["--taskHGVQA"]).task == "hgvqa"
    assert parse_reference_flags([]).task == "hgqa"
