#!/usr/bin/env python
"""Convert timm/torchvision ResNeXt-101 32x8d torch weights -> flax params.

The reference builds ``timm.create_model('resnext101_32x8d',
pretrained=True)`` with the pooled head removed (``video_encoder.py:82-93``)
and runs it per frame.  timm's ResNet state_dict layout (identical to
torchvision's for this model):

    conv1.weight, bn1.{weight,bias,running_mean,running_var}
    layer{1..4}.{i}.conv{1,2,3}.weight
    layer{1..4}.{i}.bn{1,2,3}.{weight,bias,running_mean,running_var}
    layer{1..4}.{i}.downsample.0.weight  (conv)
    layer{1..4}.{i}.downsample.1.*       (bn)

maps onto ``models/backbones_extra.ResNeXt101``:

    stem_conv/stem_bn, layer{s}_block{i}/{conv1,bn1,conv2,bn2,conv3,bn3,
    downsample_conv,downsample_bn}

torch conv weight (O, I[/groups], kH, kW) -> flax HWIO (kH, kW, I[/groups],
O); grouped 3x3 convs keep their per-group input-channel slice, which is the
same layout flax's ``feature_group_count`` expects.  BN {weight,bias} ->
{scale,bias}; running_{mean,var} -> batch_stats.

Usage:
    python tools/convert_resnext101.py resnext101_32x8d.pth \
        resnext101_flax.msgpack

The output loads through ``Trainer.load_backbone`` / ``--backboneWeights``
exactly like the slow_r50 msgpack.  Proof without the real checkpoint:
tests/test_resnext_convert.py rebuilds the torch topology with random
weights + BN stats and asserts feature parity.
"""

from __future__ import annotations

import argparse
import sys

DEPTHS = (3, 4, 23, 3)


def convert(state_dict: dict, depths=DEPTHS) -> dict:
    import numpy as np

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv_kernel(w):
        # (O, I, kH, kW) -> (kH, kW, I, O)
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))

    def bn(prefix, dst):
        put(params, dst + ("scale",),
            np.asarray(state_dict[prefix + ".weight"]))
        put(params, dst + ("bias",),
            np.asarray(state_dict[prefix + ".bias"]))
        put(stats, dst + ("mean",),
            np.asarray(state_dict[prefix + ".running_mean"]))
        put(stats, dst + ("var",),
            np.asarray(state_dict[prefix + ".running_var"]))

    put(params, ("stem_conv", "kernel"),
        conv_kernel(np.asarray(state_dict["conv1.weight"])))
    bn("bn1", ("stem_bn",))

    for s in range(4):
        for i in range(depths[s]):
            src = f"layer{s + 1}.{i}"
            dst = (f"layer{s + 1}_block{i}",)
            for c in ("1", "2", "3"):
                put(params, dst + (f"conv{c}", "kernel"),
                    conv_kernel(np.asarray(
                        state_dict[f"{src}.conv{c}.weight"])))
                bn(f"{src}.bn{c}", dst + (f"bn{c}",))
            if f"{src}.downsample.0.weight" in state_dict:
                put(params, dst + ("downsample_conv", "kernel"),
                    conv_kernel(np.asarray(
                        state_dict[f"{src}.downsample.0.weight"])))
                bn(f"{src}.downsample.1", dst + ("downsample_bn",))

    return {"params": params, "batch_stats": stats}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt", help=".pth resnext101_32x8d checkpoint")
    ap.add_argument("out", help="output msgpack path")
    args = ap.parse_args()

    import torch
    from flax.serialization import msgpack_serialize

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = ckpt.get("state_dict", ckpt.get("model", ckpt))
    state_dict = {k: v for k, v in state_dict.items()
                  if not k.startswith("fc.")}  # drop the classifier head
    tree = convert({k: v.numpy() for k, v in state_dict.items()})

    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(tree))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
