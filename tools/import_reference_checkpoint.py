#!/usr/bin/env python
"""Convert a trained reference checkpoint (.pth) into our checkpoint format.

The reference saves raw ``state_dict`` snapshots (``agqaHGQA.py:859-861``)
and evaluates them via ``--load path/BEST`` (``README.md:195``).  Our drivers
accept those ``.pth`` files directly (``Trainer.load`` detects them and
transplants in place); this tool is for converting once up front so later
runs restore the fast orbax format:

    python tools/import_reference_checkpoint.py BEST.pth \
        --output snap/imported -- --taskHGQA --noCaps --llayers 5 \
        --xlayers 2 --rlayers 5 --dlayers 5

Flags after ``--`` are the reference flags of the run that produced the
checkpoint (topology must match; shape mismatches are hard errors).
The imported snapshot is written as ``{output}/IMPORTED`` and loads with
``--load {output}/IMPORTED``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        own, ref_flags = argv[:split], argv[split + 1:]
    else:
        own, ref_flags = argv, []
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="reference .pth (or extensionless "
                                       "path like snap/run/BEST)")
    ap.add_argument("--output", default="snap/imported")
    ap.add_argument("--dataset", default="agqa", choices=["agqa", "star"])
    ns = ap.parse_args(own)

    from shgvqa_tpu.cli.common import make_model
    from shgvqa_tpu.configs.cli import parse_reference_flags
    from shgvqa_tpu.train.loop import Trainer

    cfg = parse_reference_flags(ref_flags, dataset=ns.dataset)
    cfg = cfg.replace(output=ns.output)
    # reference checkpoints carry the backbone inside, so build the
    # frames-input model when the task uses video
    trainer = Trainer(cfg, steps_per_epoch=1,
                      model=make_model(cfg, has_frames=cfg.task != "q"))
    trainer.init_params(_example_batch(cfg))
    trainer.load_reference(ns.checkpoint)
    trainer.ckpt.save("IMPORTED", trainer.state_dict())
    print(f"wrote {trainer.ckpt.path('IMPORTED')}; use --load "
          f"{trainer.ckpt.path('IMPORTED')}")


def _example_batch(cfg):
    """Minimal static-shape batch for param init (shapes only matter)."""
    import numpy as np

    b, lt = 1, cfg.data.max_seq_length
    s = cfg.data.num_situations
    batch = {
        "input_ids": np.ones((b, lt), np.int32),
        "input_mask": np.ones((b, lt), np.int32),
        "segment_ids": np.zeros((b, lt), np.int32),
    }
    if cfg.task != "q":
        batch["frames"] = np.zeros(
            (b, cfg.data.clip_len, cfg.data.image_size, cfg.data.image_size,
             3), np.uint8)
        batch["visual_mask"] = np.ones(
            (b, cfg.encoder.visual_seq_length), np.int32)
    if cfg.task in ("hgqa", "vhga", "hgvqa"):
        batch["hg_mask"] = np.ones(
            (b, s, cfg.data.num_rel + cfg.data.num_act), np.int32)
    return batch


if __name__ == "__main__":
    main()
