"""Pre-LN ViT encoder block (timm ``vit_base_patch32_224`` layout).

The reference's ``--vitInit`` replaces the visual-stream r_layers with
pretrained timm ViT-B/32 blocks ``vit.blocks[start_index:start_index+n]``
(``modeling_capsbert.py:1365-1390``) and then calls them WITHOUT an
attention mask (``layer_module(masked_vis_feats)``,
``modeling_capsbert.py:1401-1403``) — ViT blocks take no mask argument.
This module is that block, bit-faithful to timm's ``Block``:

    x = x + attn(norm1(x));  x = x + mlp(norm2(x))

with LayerNorm eps 1e-6, fused qkv projection, per-head scaling
``head_dim**-0.5``, and an exact-erf GeLU MLP.  Parameter naming mirrors the
timm state_dict (norm1/attn.qkv/attn.proj/norm2/mlp.fc1/mlp.fc2) so
``tools/convert_vit.py`` is a transpose-only mapping.

TPU-first: qkv is one fused (D, 3D) matmul; attention runs in the compute
dtype with an f32 softmax; no masks means no -10000 additive tensors.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from shgvqa_tpu.models.layers import LayerNorm, gelu

Dtype = Any


class ViTBlock(nn.Module):
    """timm vision_transformer.Block; BertLayer-compatible call signature
    (the mask argument is accepted and ignored, matching the reference's
    unmasked invocation)."""

    num_heads: int = 12
    head_dim: int = 64
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, return_probs: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        d = self.num_heads * self.head_dim
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, name=name)
        b, l, _ = x.shape

        h = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = dense(3 * d, "qkv")(h).reshape(
            b, l, 3, self.num_heads, self.head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (
            self.head_dim ** -0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        x = x + dense(d, "proj")(ctx)

        h = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        h = gelu(dense(self.mlp_ratio * d, "fc1")(h))
        x = x + dense(d, "fc2")(h)
        return x, (probs if return_probs else None)
