#!/usr/bin/env python
"""Convert pytorchvideo mvit_base_32x3 torch weights -> flax params.

The reference loads torch.hub ``mvit_base_32x3`` pretrained
(``video_encoder.py:97-103``).  No network here, so porting is a one-time
offline step:

    python tools/convert_mvit.py MVIT_B_32x3.pyth mvit_flax.msgpack

pytorchvideo ``MultiscaleVisionTransformers`` state_dict layout:

    patch_embed.patch_model.{weight,bias}
    cls_positional_encoding.{cls_token,pos_embed_spatial,
                             pos_embed_temporal,pos_embed_class}
    blocks.{i}.norm1 / .attn.qkv (or separate .attn.{q,k,v}) / .attn.proj
    blocks.{i}.attn.pool_{q,k,v}.weight + .attn.norm_{q,k,v}
    blocks.{i}.norm2 / .mlp.fc1 / .mlp.fc2 / .proj (dim-change blocks)
    norm_embed / head.* (dropped)

maps onto ``models/mvit.MViTB``:

    patch_embed; {cls_token,pos_embed_*}; block_{i}/{norm1,norm2,proj},
    block_{i}/attn/{qkv,proj,pool_q,norm_q,pool_k,norm_k,pool_v,norm_v},
    mlp_fc1/mlp_fc2; norm_embed

Layout notes:
- torch Linear (out, in) -> flax Dense kernel (in, out); the fused qkv
  Linear (3*dim, dim) -> DenseGeneral kernel (dim, 3, heads, head_dim)
  (torch row order is q then k then v, each head-major).  Checkpoints with
  separate q/k/v Linears are concatenated into the same fused layout.
- depthwise pool conv (hd, 1, kT, kH, kW) -> (kT, kH, kW, 1, hd).
- LayerNorm weight -> scale; positional tensors drop their leading
  broadcast axis.

``--heads`` gives the per-block head counts needed to reshape fused qkv
kernels; default is the MViT-B schedule from ``models.mvit.mvit_schedule``.

Proof without the real checkpoint: tests/test_mvit_convert.py rebuilds the
torch topology (exact naming) at toy dims with random weights and asserts
feature parity through the converter.
"""

from __future__ import annotations

import argparse
import sys


def convert(state_dict: dict, heads_per_block) -> dict:
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

    # patch embed: (O, 3, kT, kH, kW) -> (kT, kH, kW, 3, O)
    put(("patch_embed", "kernel"),
        np.ascontiguousarray(np.transpose(
            np.asarray(state_dict["patch_embed.patch_model.weight"]),
            (2, 3, 4, 1, 0))))
    if "patch_embed.patch_model.bias" in state_dict:
        put(("patch_embed", "bias"),
            np.asarray(state_dict["patch_embed.patch_model.bias"]))

    cpe = "cls_positional_encoding."
    put(("cls_token",), np.asarray(state_dict[cpe + "cls_token"])[0])
    put(("pos_embed_spatial",),
        np.asarray(state_dict[cpe + "pos_embed_spatial"])[0])
    put(("pos_embed_temporal",),
        np.asarray(state_dict[cpe + "pos_embed_temporal"])[0])
    put(("pos_embed_class",),
        np.asarray(state_dict[cpe + "pos_embed_class"])[0])

    n_blocks = 1 + max(int(k.split(".")[1]) for k in state_dict
                       if k.startswith("blocks."))
    for i in range(n_blocks):
        src = f"blocks.{i}"
        dst = (f"block_{i}",)
        h = heads_per_block[i]
        ln(f"{src}.norm1", dst + ("norm1",))
        ln(f"{src}.norm2", dst + ("norm2",))
        dense(f"{src}.mlp.fc1", dst + ("mlp_fc1",))
        dense(f"{src}.mlp.fc2", dst + ("mlp_fc2",))
        if f"{src}.proj.weight" in state_dict:
            dense(f"{src}.proj", dst + ("proj",))

        a = f"{src}.attn"
        ad = dst + ("attn",)
        if f"{a}.qkv.weight" in state_dict:
            w = np.asarray(state_dict[f"{a}.qkv.weight"])      # (3d, d)
            b = state_dict.get(f"{a}.qkv.bias")
        else:  # separate q/k/v checkpoints
            w = np.concatenate([np.asarray(state_dict[f"{a}.{t}.weight"])
                                for t in "qkv"], axis=0)
            bs = [state_dict.get(f"{a}.{t}.bias") for t in "qkv"]
            b = (np.concatenate([np.asarray(x) for x in bs], axis=0)
                 if bs[0] is not None else None)
        d = w.shape[1]
        put(ad + ("qkv", "kernel"),
            np.ascontiguousarray(w.T.reshape(d, 3, h, d // h)))
        if b is not None:
            put(ad + ("qkv", "bias"), np.asarray(b).reshape(3, h, d // h))
        dense(f"{a}.proj", ad + ("proj",))
        for tag in "qkv":
            pk = f"{a}.pool_{tag}.weight"
            if pk in state_dict:
                put(ad + (f"pool_{tag}",),
                    np.ascontiguousarray(np.transpose(
                        np.asarray(state_dict[pk]), (2, 3, 4, 1, 0))))
                ln(f"{a}.norm_{tag}", ad + (f"norm_{tag}",))

    ln("norm_embed", ("norm_embed",))
    return {"params": params}


def default_heads(depth=16, num_heads=1, stage_blocks=(1, 3, 14)):
    sys.path.insert(0, ".")
    from shgvqa_tpu.models.mvit import mvit_schedule

    return [row[2] for row in mvit_schedule(depth, 96, num_heads,
                                            stage_blocks, (1, 8, 8))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt", help=".pyth/.pth mvit_base checkpoint")
    ap.add_argument("out", help="output msgpack path")
    args = ap.parse_args()

    import torch
    from flax.serialization import msgpack_serialize

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = ckpt.get("model_state", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items()
                  if not k.startswith("head.")}
    tree = convert(state_dict, default_heads())
    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(tree))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
