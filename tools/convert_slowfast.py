#!/usr/bin/env python
"""Convert pytorchvideo slowfast_r50/r101 torch weights -> flax params.

The reference builds ``torch.hub.load('facebookresearch/pytorchvideo',
'slowfast_r50', pretrained=True)`` with the head and pool replaced by
Identity (``video_encoder.py:55-79``).  No network here, so porting is a
one-time offline step:

    python tools/convert_slowfast.py SLOWFAST_8x8_R50.pyth out.msgpack
    python tools/convert_slowfast.py --depth 101 SLOWFAST_8x8_R101.pyth out.msgpack

pytorchvideo ``Net`` layout (MultiPathWayWithFuse blocks; pathway 0 = slow,
1 = fast):

    blocks.0.multipathway_blocks.{p}.conv/.norm         (stems)
    blocks.0.multipathway_fusion.conv_fast_to_slow/.norm
    blocks.{1..4}.multipathway_blocks.{p}.res_blocks.{i}.
        branch1_conv/.branch1_norm/.branch2.conv_{a,b,c}/.norm_{a,b,c}
    blocks.{1..3}.multipathway_fusion.*                 (no fusion after 4)
    blocks.5 (pool, no params) / blocks.6.proj (head -> dropped)

maps onto ``models/backbones_extra.SlowFastR50``:

    {slow,fast}_stem_{conv,bn}; fuse_{0..3}_{conv,bn};
    {slow,fast}_res_{2..5}/block_{i}/{conv,bn}_{a,b,c} + {conv,bn}_proj

torch conv weight (O, I, kT, kH, kW) -> flax NDHWC (kT, kH, kW, I, O);
BN {weight,bias} -> {scale,bias}; running_{mean,var} -> batch_stats.

Proof without the real checkpoint: tests/test_slowfast_convert.py rebuilds
the torch topology (exact state_dict naming) with random weights + BN
stats and asserts per-pathway feature parity.
"""

from __future__ import annotations

import argparse
import sys

PATHWAYS = ("slow", "fast")


def convert(state_dict: dict, depths=(3, 4, 6, 3)) -> dict:
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
        put(params, dst + ("scale",),
            np.asarray(state_dict[prefix + ".weight"]))
        put(params, dst + ("bias",),
            np.asarray(state_dict[prefix + ".bias"]))
        put(stats, dst + ("mean",),
            np.asarray(state_dict[prefix + ".running_mean"]))
        put(stats, dst + ("var",),
            np.asarray(state_dict[prefix + ".running_var"]))

    # stems
    for p, path in enumerate(PATHWAYS):
        src = f"blocks.0.multipathway_blocks.{p}"
        put(params, (f"{path}_stem_conv", "kernel"),
            conv_kernel(np.asarray(state_dict[f"{src}.conv.weight"])))
        bn(f"{src}.norm", (f"{path}_stem_bn",))

    # fusions: after the stem (blocks.0) and after stages 1-3
    for b in range(4):
        src = f"blocks.{b}.multipathway_fusion"
        put(params, (f"fuse_{b}_conv", "kernel"),
            conv_kernel(np.asarray(
                state_dict[f"{src}.conv_fast_to_slow.weight"])))
        bn(f"{src}.norm", (f"fuse_{b}_bn",))

    # res stages
    for stage in range(4):
        for p, path in enumerate(PATHWAYS):
            sb = f"blocks.{stage + 1}.multipathway_blocks.{p}"
            sname = f"{path}_res_{stage + 2}"
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
    ap.add_argument("torch_ckpt", help=".pyth/.pth slowfast checkpoint")
    ap.add_argument("out", help="output msgpack path")
    ap.add_argument("--depth", type=int, default=50, choices=(50, 101))
    args = ap.parse_args()

    import torch
    from flax.serialization import msgpack_serialize

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = ckpt.get("model_state", ckpt)
    state_dict = {k: v for k, v in state_dict.items()
                  if not (k.startswith("blocks.5") or
                          k.startswith("blocks.6"))}  # pool + head
    depths = (3, 4, 6, 3) if args.depth == 50 else (3, 4, 23, 3)
    tree = convert({k: v.numpy() for k, v in state_dict.items()},
                   depths=depths)
    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(tree))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
