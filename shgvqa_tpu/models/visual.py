"""Visual token embedder.

Rebuild of ``VisualFeatEncoder`` (``modeling_capsbert.py:966-1073``, no-caps
path): two Conv3d(kernel=(5,3,3)) + GeLU stages with SPATIAL-only zero pad 1
(the reference's nn.ZeroPad2d(1) pads only H/W of the 5-D tensor), so a
(B, 16, 7, 7, 2048) backbone feature map becomes (B, 8, 7, 7, H) = 392
tokens; a learned CLS token (zero-initialized, trainable) is prepended and a
learned positional embedding over all t*hw*hw+1 positions is added, followed
by dropout.

``patches=True`` is the reference's ``--patches`` mode
(``modeling_capsbert.py:978-996``): non-overlapping 32x32 RGB patches
(flatten_dim 32*32*3 = 3072, the VisualConfig ``visual_feat_dim=3072``
switch at ``modeling_capsbert.py:173-174``) through one
``linear_encoding`` projection instead of the conv stack.  The reference's
own forward is latent-broken in this mode — ``img.view(B, dim, 7, 7)``
(4-D, ``:1046-1048``) feeds branches that unpack 5 dims (``:1057``) or a
Conv3d PrimaryCaps — so this implements the evident intent: patchified
clip features (already temporally subsampled to ``t``) -> linear -> the
standard CLS + learned-positions token stream, preserving the 393-token
geometry.

TPU-first: channels-last NDHWC layout so XLA maps the convs straight onto the
MXU without transposes; the patch path is a single reshape + one MXU matmul."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from shgvqa_tpu.models.layers import bert_kernel_init, gelu

Dtype = Any


def patchify_clip(frames: jnp.ndarray, visual_t: int, hw: int) -> jnp.ndarray:
    """(B, T, S, S, 3) frames -> (B, visual_t, hw, hw, (S//hw)**2 * 3).

    Temporal: nearest-neighbor uniform subsample T -> visual_t (the same
    linspace semantics as ``vis_utils.py:366-385``; the conv path compresses
    16 -> 8 with its VALID kernel-5 convs, the patch path subsamples).
    Spatial: non-overlapping (S//hw)^2-pixel patches — 32x32 at the
    reference geometry (S=224, hw=7), flatten_dim 3072
    (``modeling_capsbert.py:981-986``)."""
    b, t, s, _, c = frames.shape
    assert s % hw == 0, f"image size {s} not divisible by patch grid {hw}"
    p = s // hw
    from shgvqa_tpu.data.featurize import uniform_subsample_indices

    idx = np.asarray(uniform_subsample_indices(t, visual_t))
    x = frames[:, idx]                                  # (B, t', S, S, 3)
    x = x.reshape(b, visual_t, hw, p, hw, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)                # (B,t',hw,hw,p,p,3)
    return x.reshape(b, visual_t, hw, hw, p * p * c)


class VisualTokenizer(nn.Module):
    hidden_size: int
    dropout: float = 0.1
    # --patches: linear 32x32-patch encoding instead of the conv stack
    # (modeling_capsbert.py:978-996; see module docstring for the latent
    # breakage in the reference forward this path repairs)
    patches: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        """feats: (B, T, H, W, C) channel-last backbone features — or, with
        ``patches=True``, pre-patchified clips from :func:`patchify_clip`
        (B, t, hw, hw, flatten_dim).

        Returns (B, 1 + T'*H*W, hidden) tokens, T' = T - 8 temporal valid
        reduction from two kernel-5 convs (16 -> 8 at reference geometry);
        the patch path keeps its input's t (already subsampled).
        """
        b = feats.shape[0]
        if self.patches:
            x = nn.Dense(
                self.hidden_size,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=bert_kernel_init,
                bias_init=nn.initializers.zeros,
                name="linear_encoding",
            )(feats.astype(self.dtype))
        else:
            conv = lambda name: nn.Conv(  # noqa: E731
                self.hidden_size,
                kernel_size=(5, 3, 3),
                strides=(1, 1, 1),
                # VALID in time, zero-pad 1 in space == ZeroPad2d(1)+valid
                # conv
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
