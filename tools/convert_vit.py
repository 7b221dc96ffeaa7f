#!/usr/bin/env python
"""Convert a timm ViT-B/32 checkpoint -> shgvqa_tpu --vitInit r-layer params.

The reference's ``--vitInit`` loads ``timm.create_model('vit_base_patch32_224',
pretrained=True)`` at model build and takes
``vit.blocks[start_index:start_index+num_r_layers]`` as the visual-stream
r_layers (``modeling_capsbert.py:1377-1390``; ``--startIndex`` default 7 per
``param.py:86``).  This environment has no network, so the port is a one-time
offline step over a downloaded state_dict:

    python tools/convert_vit.py vit_base_patch32_224.bin vit_r_layers.msgpack \
        --layers 5 --start-index 7

The output msgpack holds {"r_0": ..., "r_{n-1}"} flax ViTBlock trees
(models/vit.py).  At runtime the driver loads the RAW torch checkpoint
directly (``Trainer.load_vit_layers`` via ``--vitWeights``), so this tool is
mainly for ``--check`` verification and for shipping a torch-free artifact.

Verification: ``--check`` rebuilds the sliced blocks in torch (timm Block
topology: pre-LN, fused qkv, erf-GeLU MLP) from the same state_dict and
compares forwards on random tokens to f32 tolerance.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="timm vit_base_patch32_224 state_dict "
                                "(.bin/.pth/.npz)")
    ap.add_argument("out", help="output msgpack path")
    ap.add_argument("--layers", type=int, default=5,
                    help="number of r_layers (--rlayers)")
    ap.add_argument("--start-index", type=int, default=7,
                    help="first ViT block to take (--startIndex)")
    ap.add_argument("--check", action="store_true",
                    help="verify vs a torch rebuild of the sliced blocks")
    args = ap.parse_args()

    from flax.serialization import msgpack_serialize

    from shgvqa_tpu.utils.torch_import import (
        load_torch_state_dict,
        vit_to_r_layers,
    )

    sd = load_torch_state_dict(args.src)
    tree = vit_to_r_layers(sd, args.layers, args.start_index)
    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(tree))
    n_tensors = sum(1 for _ in _leaves(tree))
    print(f"wrote {args.out}: {args.layers} blocks "
          f"[{args.start_index}:{args.start_index + args.layers}], "
          f"{n_tensors} tensors")

    if args.check:
        ok = check(sd, tree, args.layers, args.start_index)
        sys.exit(0 if ok else 1)


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def check(sd, tree, num_layers: int, start_index: int) -> bool:
    """Compare flax ViTBlock forwards vs a torch rebuild of timm's Block."""
    import numpy as np
    import torch
    import torch.nn as tnn

    import jax.numpy as jnp

    from shgvqa_tpu.models.vit import ViTBlock

    d = sd[f"blocks.{start_index}.norm1.weight"].shape[0]
    heads = 12
    rng = np.random.RandomState(0)
    x = rng.randn(2, 17, d).astype(np.float32)

    class TorchBlock(tnn.Module):
        # timm vision_transformer.Block topology (the exact module the
        # reference slices at modeling_capsbert.py:1381-1388)
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(d, eps=1e-6)
            self.qkv = tnn.Linear(d, 3 * d)
            self.proj = tnn.Linear(d, d)
            self.norm2 = tnn.LayerNorm(d, eps=1e-6)
            self.fc1 = tnn.Linear(d, 4 * d)
            self.fc2 = tnn.Linear(4 * d, d)

        def forward(self, x):
            b, l, _ = x.shape
            h = self.norm1(x)
            qkv = self.qkv(h).reshape(b, l, 3, heads, d // heads)
            q, k, v = (qkv[:, :, i].permute(0, 2, 1, 3) for i in range(3))
            att = (q @ k.transpose(-2, -1)) * (d // heads) ** -0.5
            att = att.softmax(dim=-1)
            h = (att @ v).permute(0, 2, 1, 3).reshape(b, l, d)
            x = x + self.proj(h)
            return x + self.fc2(
                torch.nn.functional.gelu(self.fc1(self.norm2(x))))

    ok = True
    for i in range(num_layers):
        pfx = f"blocks.{start_index + i}"
        tb = TorchBlock()
        with torch.no_grad():
            tb.norm1.weight.copy_(torch.from_numpy(sd[f"{pfx}.norm1.weight"]))
            tb.norm1.bias.copy_(torch.from_numpy(sd[f"{pfx}.norm1.bias"]))
            tb.qkv.weight.copy_(torch.from_numpy(sd[f"{pfx}.attn.qkv.weight"]))
            tb.qkv.bias.copy_(torch.from_numpy(sd[f"{pfx}.attn.qkv.bias"]))
            tb.proj.weight.copy_(
                torch.from_numpy(sd[f"{pfx}.attn.proj.weight"]))
            tb.proj.bias.copy_(torch.from_numpy(sd[f"{pfx}.attn.proj.bias"]))
            tb.norm2.weight.copy_(torch.from_numpy(sd[f"{pfx}.norm2.weight"]))
            tb.norm2.bias.copy_(torch.from_numpy(sd[f"{pfx}.norm2.bias"]))
            tb.fc1.weight.copy_(torch.from_numpy(sd[f"{pfx}.mlp.fc1.weight"]))
            tb.fc1.bias.copy_(torch.from_numpy(sd[f"{pfx}.mlp.fc1.bias"]))
            tb.fc2.weight.copy_(torch.from_numpy(sd[f"{pfx}.mlp.fc2.weight"]))
            tb.fc2.bias.copy_(torch.from_numpy(sd[f"{pfx}.mlp.fc2.bias"]))
            want = tb(torch.from_numpy(x)).numpy()

        blk = ViTBlock(num_heads=heads, head_dim=d // heads)
        got, _ = blk.apply({"params": tree[f"r_{i}"]}, jnp.asarray(x))
        err = float(np.abs(np.asarray(got) - want).max())
        print(f"r_{i} (vit block {start_index + i}): max abs err {err:.2e}")
        ok &= err < 1e-4
    print("CHECK", "PASSED" if ok else "FAILED")
    return ok


if __name__ == "__main__":
    main()
