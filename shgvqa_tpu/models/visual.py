"""Visual token embedder.

Rebuild of ``VisualFeatEncoder`` (``modeling_capsbert.py:966-1073``, no-caps
path): two Conv3d(kernel=(5,3,3)) + GeLU stages with SPATIAL-only zero pad 1
(the reference's nn.ZeroPad2d(1) pads only H/W of the 5-D tensor), so a
(B, 16, 7, 7, 2048) backbone feature map becomes (B, 8, 7, 7, H) = 392
tokens; a learned CLS token (zero-initialized, trainable) is prepended and a
learned positional embedding over all t*hw*hw+1 positions is added, followed
by dropout.

TPU-first: channels-last NDHWC layout so XLA maps the convs straight onto the
MXU without transposes."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from shgvqa_tpu.models.layers import bert_kernel_init, gelu

Dtype = Any


class VisualTokenizer(nn.Module):
    hidden_size: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        """feats: (B, T, H, W, C) channel-last backbone features.

        Returns (B, 1 + T'*H*W, hidden) tokens, T' = T - 8 temporal valid
        reduction from two kernel-5 convs (16 -> 8 at reference geometry).
        """
        b = feats.shape[0]
        conv = lambda name: nn.Conv(  # noqa: E731
            self.hidden_size,
            kernel_size=(5, 3, 3),
            strides=(1, 1, 1),
            # VALID in time, zero-pad 1 in space == ZeroPad2d(1)+valid conv
            padding=((0, 0), (1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=bert_kernel_init,
            bias_init=nn.initializers.zeros,
            name=name,
        )
        x = gelu(conv("conv1")(feats.astype(self.dtype)))
        x = gelu(conv("conv2")(x))
        _, t, h, w, c = x.shape
        tokens = x.reshape(b, t * h * w, c)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden_size))
        cls = jnp.broadcast_to(cls.astype(self.dtype),
                               (b, 1, self.hidden_size))
        x = jnp.concatenate([cls, tokens], axis=1)

        seq_len = x.shape[1]
        pos = self.param("pos_embedding", bert_kernel_init,
                         (seq_len, self.hidden_size))
        x = x + pos.astype(self.dtype)[None]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
