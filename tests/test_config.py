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


def test_flag_closure_vs_reference_param_py():
    """Every flag the reference's param.py defines parses here too, and the
    two latent-crash flags fail with a diagnosis instead of a NameError/
    NotImplementedError deep in the model (param.py:33-201)."""
    from shgvqa_tpu.configs.cli import (build_parser,
                                        parse_reference_flags_with_extras)

    # spellings lifted from param.py (value-taking ones get a dummy value)
    parser = build_parser()
    known = {a.option_strings[0] for a in parser._actions if a.option_strings}
    for flag in ("--excludeSet", "--loadLXMERTQA", "--optim"):
        assert flag in known, flag

    _, extras = parse_reference_flags_with_extras(
        ["--loadLXMERTQA", "snap/Epoch01"])
    assert extras["load_lxmert_qa"] == "snap/Epoch01"

    import pytest as _pytest
    with _pytest.raises(SystemExit, match="GroundingHead"):
        parse_reference_flags_with_extras(["--taskGrounding"])
    with _pytest.raises(SystemExit, match="attnRouting"):
        parse_reference_flags_with_extras(["--attnRouting"])


def test_nonbert_optim_flag_flows_to_trainer_mode():
    """--optim adam must select the plain-optimizer tree path (the flat step
    body hardcodes BertAdam math)."""
    cfg = parse_reference_flags(["--optim", "adam"])
    assert cfg.optim.optim == "adam"
    cfg = parse_reference_flags(["--optim", "bert"])
    assert cfg.optim.optim == "bert"


def test_perf_knob_flags_flow_to_config():
    """Round-3 perf knobs: --rematPolicy selects a jax.checkpoint save
    policy (with --remat), and the aug pipeline knobs default on."""
    from shgvqa_tpu.configs.cli import parse_reference_flags

    argv = ("--train train --taskHGQA --noCaps "
            "--remat --rematPolicy dots_attn").split()
    cfg = parse_reference_flags(argv, dataset="agqa")
    assert cfg.remat and cfg.remat_policy == "dots_attn"
    assert cfg.data.aug_subbatch          # sub-batch aug default-on
    assert cfg.data.aug_dtype == ""       # frames dtype follows compute

    cfg2 = parse_reference_flags("--train train --taskHGQA --noCaps".split(),
                                 dataset="agqa")
    assert not cfg2.remat and cfg2.remat_policy == ""
