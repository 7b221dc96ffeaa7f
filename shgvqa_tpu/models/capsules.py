"""Matrix-capsule visual encoder with EM routing (--noCaps off path).

Rebuild of the reference's optional capsule pipeline: ``PrimaryCaps`` /
``ConvCaps`` EM routing (``lxrt/capsules_new_3d.py:189-295``) and the
language-conditioned capsule masking of ``LXRTCapsulesEncoder``
(``modeling_capsbert.py:1305-1501``).  Every published AGQA/STAR recipe runs
with ``--noCaps`` (the plain conv tokenizer); this path exists for capability
parity and ablation work.

Shapes follow the reference geometry: a (B, T, H, W, D) feature map becomes
per-position capsules with PxP pose matrices + activations; EM routing (3
iterations) maps ``num_prim_caps`` -> ``num_vis_caps`` per position; tokens
are the flattened (pose || activation) vectors of dim
``num_vis_caps * (P*P + 1)`` (``VisualConfig.caps_dim``).

EM routing is the Hinton et al. matrix-capsule procedure: vote matrices
V_ij = pose_i @ W_ij, then alternate
  m-step: Gaussian stats of each output capsule under routing weights,
          activation from the description-length cost through a sigmoid;
  e-step: posterior responsibilities r_ij from the Gaussian likelihoods.
All steps are dense einsums over (positions, C_in, C_out, P*P) — MXU-sized,
no data-dependent control flow.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from shgvqa_tpu.models.layers import Dense, bert_kernel_init

Dtype = Any


class PrimaryCaps(nn.Module):
    """1x1 conv -> per-position primary capsules (pose + activation)."""

    num_caps: int
    pose_dim: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (..., D) -> poses (..., num_caps, P*P), activations
        (..., num_caps)."""
        p2 = self.pose_dim * self.pose_dim
        poses = Dense(self.num_caps * p2, dtype=self.dtype,
                      name="pose")(x)
        act = jax.nn.sigmoid(
            Dense(self.num_caps, dtype=self.dtype, name="act")(x)
            .astype(jnp.float32))
        lead = x.shape[:-1]
        return poses.reshape(*lead, self.num_caps, p2), act.astype(self.dtype)


class EMRouting(nn.Module):
    """C_in capsules -> C_out capsules per position via EM routing."""

    c_out: int
    pose_dim: int = 4
    iters: int = 3
    eps: float = 1e-8
    final_lambda: float = 1e-2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, poses: jnp.ndarray, acts: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """poses (N, C_in, P*P), acts (N, C_in) ->
        (N, C_out, P*P), (N, C_out)."""
        n, c_in, p2 = poses.shape
        p = self.pose_dim
        w = self.param("w", bert_kernel_init, (c_in, self.c_out, p, p))
        beta_u = self.param("beta_u", nn.initializers.zeros, (self.c_out,))
        beta_a = self.param("beta_a", nn.initializers.zeros, (self.c_out,))

        # votes: (N, C_in, C_out, P*P) — pose matrix times transform matrix
        pm = poses.reshape(n, c_in, p, p).astype(jnp.float32)
        votes = jnp.einsum("nipq,ijqr->nijpr", pm, w.astype(jnp.float32))
        votes = votes.reshape(n, c_in, self.c_out, p2)

        a_in = acts.astype(jnp.float32)[:, :, None]          # (N, C_in, 1)
        r = jnp.full((n, c_in, self.c_out), 1.0 / self.c_out)

        mu = jnp.zeros((n, self.c_out, p2))
        a_out = jnp.zeros((n, self.c_out))
        for it in range(self.iters):
            lam = self.final_lambda * (1.0 - 0.95 ** (it + 1))
            # m-step
            rw = r * a_in                                    # (N, C_in, C_out)
            denom = jnp.sum(rw, axis=1, keepdims=True) + self.eps
            mu = jnp.einsum("nij,nijh->njh", rw, votes) / denom.transpose(
                0, 2, 1)
            diff2 = (votes - mu[:, None]) ** 2
            sigma2 = jnp.einsum("nij,nijh->njh", rw, diff2) / denom.transpose(
                0, 2, 1) + self.eps
            cost = (beta_u[None, :, None] + 0.5 * jnp.log(sigma2)) * \
                denom.transpose(0, 2, 1)
            a_out = jax.nn.sigmoid(
                lam * (beta_a[None] - jnp.sum(cost, axis=-1)))
            # e-step (skip after the last m-step)
            if it < self.iters - 1:
                log_p = -0.5 * jnp.sum(
                    jnp.log(2 * jnp.pi * sigma2[:, None]) +
                    diff2 / sigma2[:, None],
                    axis=-1,
                )                                            # (N, C_in, C_out)
                log_ra = jnp.log(a_out[:, None] + self.eps) + log_p
                r = jax.nn.softmax(log_ra, axis=-1)

        return mu.astype(self.dtype), a_out.astype(self.dtype)


class CapsuleVisualTokenizer(nn.Module):
    """Backbone features -> capsule tokens + CLS + learned positions.

    Equivalent of the VisualFeatEncoder capsule branch
    (``modeling_capsbert.py:1004-1016,1060-1071``): visn_fc projection,
    primary caps, EM conv caps, tokens of dim num_vis_caps*(P*P+1).
    """

    hidden_size: int
    num_prim_caps: int = 32
    num_vis_caps: int = 32
    pose_dim: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @property
    def caps_dim(self) -> int:
        return self.num_vis_caps * (self.pose_dim ** 2 + 1)

    @nn.compact
    def __call__(self, feats: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        """feats (B, T, H, W, C) -> (B, 1 + T*H*W, caps_dim)."""
        b, t, h, w, _ = feats.shape
        x = Dense(self.hidden_size, dtype=self.dtype, name="visn_fc")(
            feats.astype(self.dtype))
        poses, acts = PrimaryCaps(
            self.num_prim_caps, self.pose_dim, dtype=self.dtype,
            name="primary_caps")(x)
        n = b * t * h * w
        p2 = self.pose_dim ** 2
        poses = poses.reshape(n, self.num_prim_caps, p2)
        acts = acts.reshape(n, self.num_prim_caps)
        mu, a_out = EMRouting(
            self.num_vis_caps, self.pose_dim, dtype=self.dtype,
            name="conv_caps")(poses, acts)
        tokens = jnp.concatenate([
            mu.reshape(n, self.num_vis_caps * p2),
            a_out.reshape(n, self.num_vis_caps),
        ], axis=-1).reshape(b, t * h * w, self.caps_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.caps_dim))
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.caps_dim))
        x = jnp.concatenate([cls, tokens], axis=1)
        pos = self.param("pos_embedding", bert_kernel_init,
                         (x.shape[1], self.caps_dim))
        x = x + pos.astype(self.dtype)[None]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class LanguageCapsuleMask(nn.Module):
    """Language-conditioned capsule masking
    (``modeling_capsbert.py:1266-1271`` mask_capsules): the language CLS
    picks a soft distribution over capsule types; capsule token features are
    modulated per-type.  Optional residual skip preserves unmasked content
    (skip_connection flag)."""

    num_vis_caps: int
    pose_dim: int = 4
    skip_connection: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, caps_tokens: jnp.ndarray, lang_cls: jnp.ndarray
                 ) -> jnp.ndarray:
        """caps_tokens (B, L, caps_dim) with caps_dim = C*(P*P+1);
        lang_cls (B, D)."""
        b, l, caps_dim = caps_tokens.shape
        c = self.num_vis_caps
        unit = caps_dim // c
        mask_logits = Dense(c, dtype=self.dtype, name="mask_capsules")(
            lang_cls)
        mask = jax.nn.softmax(mask_logits.astype(jnp.float32), axis=-1)
        mask = mask.astype(self.dtype)
        # keep CLS token (index 0) unmasked, like the reference (:1269-1270)
        body = caps_tokens[:, 1:].reshape(b, l - 1, c, unit)
        body = body * mask[:, None, :, None]
        body = body.reshape(b, l - 1, caps_dim)
        if self.skip_connection:
            body = body + caps_tokens[:, 1:]
        return jnp.concatenate([caps_tokens[:, :1], body], axis=1)
