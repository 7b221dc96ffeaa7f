"""lax.scan wrappers for homogeneous layer stacks.

On per-op-dispatch TPU backends (remote relays) every XLA thunk execution
pays a fixed launch cost; an unrolled N-layer stack emits N copies of the
layer's ops.  ``nn.scan`` compiles the layer body ONCE and iterates it,
cutting op count ~Nx (measured 6x wall-time for the 5-layer HG decoder).

Params gain a leading layer axis (variable_axes={'params': 0}) — or are
broadcast for weight-tied stacks (variable_axes={'params': None}), which is
exactly the reference's tied x_layers semantics.

Attention-prob outputs are not supported under scan; callers fall back to
the unrolled path when output_attentions is requested.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from shgvqa_tpu.models.layers import BertLayer

Dtype = Any


class ScannedBertStack(nn.Module):
    """N BertLayers with independent (stacked) params, run under scan."""

    num_layers: int
    num_heads: int
    head_dim: int
    intermediate_size: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32
    remat: bool = False   # recompute the body in backward (saves the
                          # (L, B, T, D) stacked activations in HBM)
    remat_policy: str = ""

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        class Body(nn.Module):
            num_heads: int
            head_dim: int
            intermediate_size: int
            attn_dropout: float
            hidden_dropout: float
            dtype: Any

            @nn.compact
            def __call__(self, carry, mask, det):
                out, _ = BertLayer(
                    self.num_heads, self.head_dim, self.intermediate_size,
                    self.attn_dropout, self.hidden_dropout, dtype=self.dtype,
                )(carry, mask, det, False)
                return out, None

        from shgvqa_tpu.models.layers import remat_class

        body_cls = remat_class(Body, (3,), self.remat, self.remat_policy)
        scanned = nn.scan(
            body_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        out, _ = scanned(
            self.num_heads, self.head_dim, self.intermediate_size,
            self.attn_dropout, self.hidden_dropout, self.dtype,
            name="layers",
        )(x, mask, deterministic)
        return out


class ScannedCrossStack(nn.Module):
    """N cross-modal layers under scan.

    ``tie=True`` broadcasts ONE set of params across iterations — the
    reference's accidental weight tying (modeling_capsbert.py:1247-1249) as a
    loop instead of repeated calls.  Only valid for step-independent variants
    ('cross'/'old'; 'self'/'cross_self' change sequence shapes at step 0 and
    stay unrolled)."""

    layer_cls: Any
    num_layers: int
    tie: bool
    num_heads: int
    head_dim: int
    intermediate_size: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: str = ""

    @nn.compact
    def __call__(self, lang, lang_mask, visn, visn_mask, deterministic=True):
        layer_cls = self.layer_cls

        class Body(nn.Module):
            num_heads: int
            head_dim: int
            intermediate_size: int
            attn_dropout: float
            hidden_dropout: float
            dtype: Any

            @nn.compact
            def __call__(self, carry, lang_mask, visn_mask, det):
                lang, visn = carry
                lang, visn, _ = layer_cls(
                    num_heads=self.num_heads,
                    head_dim=self.head_dim,
                    intermediate_size=self.intermediate_size,
                    attn_dropout=self.attn_dropout,
                    hidden_dropout=self.hidden_dropout,
                    dtype=self.dtype,
                )(lang, lang_mask, visn, visn_mask,
                  deterministic=det, return_probs=False)
                return (lang, visn), None

        from shgvqa_tpu.models.layers import remat_class

        body_cls = remat_class(Body, (4,), self.remat, self.remat_policy)
        if self.tie:
            # weight-tied stack: ONE param set broadcast across iterations
            scanned = nn.scan(
                body_cls,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                length=self.num_layers,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            )
        else:
            scanned = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            )
        (lang, visn), _ = scanned(
            self.num_heads, self.head_dim, self.intermediate_size,
            self.attn_dropout, self.hidden_dropout, self.dtype,
            name="x_tied" if self.tie else "x_layers",
        )((lang, visn), lang_mask, visn_mask, deterministic)
        return lang, visn
