#!/usr/bin/env python
"""Convert official Video Swin (SwinTransformer3D) torch weights -> flax.

The reference's 'video_swin' row raises NotImplementedError
(``video_encoder.py:92-95``); our ``models/video_swin.VideoSwin`` goes
beyond it.  This maps the official Video-Swin / mmaction checkpoint
(``swin_base_patch244_window877_kinetics400_22k.pth``, state_dict keys
under ``backbone.``):

    patch_embed.proj.{weight,bias} / patch_embed.norm.*
    layers.{i}.blocks.{j}.norm1 / norm2
    layers.{i}.blocks.{j}.attn.{qkv,proj}.{weight,bias}
    layers.{i}.blocks.{j}.attn.relative_position_bias_table
    layers.{i}.blocks.{j}.attn.relative_position_index   (buffer: dropped,
        recomputed statically at trace time)
    layers.{i}.downsample.{norm.*,reduction.weight}
    norm.{weight,bias}

onto ``VideoSwin``: patch_embed/patch_norm, layer_{i}_block_{j}/{norm1,
norm2,attn/{qkv,proj,relative_position_bias_table},mlp_fc1,mlp_fc2},
downsample_{i}_{norm,reduction}, norm.

torch Linear (out, in) -> flax Dense (in, out); conv (C,3,2,4,4) ->
(2,4,4,3,C); LayerNorm weight -> scale.

Usage: python tools/convert_video_swin.py swin_base.pth out.msgpack
Proof without the real checkpoint: tests/test_video_swin.py rebuilds the
torch topology at toy dims and asserts feature parity.
"""

from __future__ import annotations

import argparse
import sys


def convert(state_dict: dict) -> dict:
    import numpy as np

    params: dict = {}

    def put(path, value):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def dense(src, dst):
        put(dst + ("kernel",),
            np.ascontiguousarray(np.asarray(state_dict[src + ".weight"]).T))
        if src + ".bias" in state_dict:
            put(dst + ("bias",), np.asarray(state_dict[src + ".bias"]))

    def ln(src, dst):
        put(dst + ("scale",), np.asarray(state_dict[src + ".weight"]))
        put(dst + ("bias",), np.asarray(state_dict[src + ".bias"]))

    put(("patch_embed", "kernel"),
        np.ascontiguousarray(np.transpose(
            np.asarray(state_dict["patch_embed.proj.weight"]),
            (2, 3, 4, 1, 0))))
    put(("patch_embed", "bias"),
        np.asarray(state_dict["patch_embed.proj.bias"]))
    ln("patch_embed.norm", ("patch_norm",))

    n_layers = 1 + max(int(k.split(".")[1]) for k in state_dict
                       if k.startswith("layers."))
    for i in range(n_layers):
        blocks = {int(k.split(".")[3]) for k in state_dict
                  if k.startswith(f"layers.{i}.blocks.")}
        for j in sorted(blocks):
            src = f"layers.{i}.blocks.{j}"
            dst = (f"layer_{i}_block_{j}",)
            ln(f"{src}.norm1", dst + ("norm1",))
            ln(f"{src}.norm2", dst + ("norm2",))
            dense(f"{src}.attn.qkv", dst + ("attn", "qkv"))
            dense(f"{src}.attn.proj", dst + ("attn", "proj"))
            put(dst + ("attn", "relative_position_bias_table"),
                np.asarray(
                    state_dict[f"{src}.attn.relative_position_bias_table"]))
            dense(f"{src}.mlp.fc1", dst + ("mlp_fc1",))
            dense(f"{src}.mlp.fc2", dst + ("mlp_fc2",))
        if f"layers.{i}.downsample.reduction.weight" in state_dict:
            ln(f"layers.{i}.downsample.norm", (f"downsample_{i}_norm",))
            dense(f"layers.{i}.downsample.reduction",
                  (f"downsample_{i}_reduction",))

    ln("norm", ("norm",))
    return {"params": params}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out")
    args = ap.parse_args()

    import torch
    from flax.serialization import msgpack_serialize

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    sd = {k[len("backbone."):] if k.startswith("backbone.") else k: v.numpy()
          for k, v in sd.items()
          if "relative_position_index" not in k
          and not k.startswith(("cls_head", "head"))}
    tree = convert(sd)
    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(tree))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
