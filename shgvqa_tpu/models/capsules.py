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
    # 'hinton': the matrix-capsule paper procedure with a scheduled lambda
    #   (documented divergence -- the repo default).
    # 'reference': bit-faithful capsules_new_3d.py:189-295 math, including
    #   its quirks: beta_u per (C_out, P*P), fixed lambda 1e-6, double
    #   r-normalization, and the cost-stdv term that is identically
    #   sqrt(eps) because sum(cost - mean) == 0 before squaring (:226-233).
    variant: str = "hinton"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, poses: jnp.ndarray, acts: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """poses (N, C_in, P*P), acts (N, C_in) ->
        (N, C_out, P*P), (N, C_out)."""
        n, c_in, p2 = poses.shape
        p = self.pose_dim
        w = self.param("w", bert_kernel_init, (c_in, self.c_out, p, p))
        beta_shape = (self.c_out, p2) if self.variant == "reference" \
            else (self.c_out,)
        beta_u = self.param("beta_u", nn.initializers.zeros, beta_shape)
        beta_a = self.param("beta_a", nn.initializers.zeros, (self.c_out,))

        # votes: (N, C_in, C_out, P*P) — pose matrix times transform matrix
        # (capsules_new_3d.py transform_view: x @ w)
        pm = poses.reshape(n, c_in, p, p).astype(jnp.float32)
        votes = jnp.einsum("nipq,ijqr->nijpr", pm, w.astype(jnp.float32))
        votes = votes.reshape(n, c_in, self.c_out, p2)

        if self.variant == "reference":
            mu, a_out = _em_routing_reference(
                votes, acts.astype(jnp.float32), beta_u, beta_a,
                iters=self.iters, eps=self.eps)
            return mu.astype(self.dtype), a_out.astype(self.dtype)

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


def _em_routing_reference(votes, a_in, beta_u, beta_a, iters=3, eps=1e-8,
                          lam=1e-6):
    """Exact reimplementation of ConvCaps.caps_em_routing
    (capsules_new_3d.py:189-295), quirks preserved:

    - r is renormalized over OUTPUT capsules after multiplying input
      activations (m_step:210-211), then again over inputs via coeff;
    - cost uses log(sigma) (i.e. 0.5*log sigma^2) with beta_u per
      (C_out, P*P);
    - a_out normalizes cost by a 'stdv' that is sqrt(sum(cost - mean))^2/C
      with the sum taken BEFORE squaring -- identically sqrt(eps) -- and a
      fixed lambda of 1e-6 (:176, :226-233);
    - e-step is the standard Gaussian responsibility update.

    votes (N, B, C, P*P), a_in (N, B) -> mu (N, C, P*P), a_out (N, C).
    """
    n, b_in, c, p2 = votes.shape
    ln_2pi = jnp.log(2 * jnp.pi)
    r = jnp.full((n, b_in, c), 1.0 / c)
    a3 = a_in[:, :, None]
    mu = jnp.zeros((n, 1, c, p2))
    sigma_sq = jnp.ones((n, 1, c, p2))
    a_out = jnp.zeros((n, c))
    for it in range(iters):
        rw = r * a3
        rw = rw / (jnp.sum(rw, axis=2, keepdims=True) + eps)
        r_sum = jnp.sum(rw, axis=1, keepdims=True)           # (N, 1, C)
        coeff = (rw / (r_sum + eps))[..., None]              # (N, B, C, 1)
        mu = jnp.sum(coeff * votes, axis=1, keepdims=True)   # (N, 1, C, P*P)
        sigma_sq = jnp.sum(coeff * (votes - mu) ** 2, axis=1,
                           keepdims=True) + eps
        cost_h = (beta_u[None] + jnp.log(jnp.sqrt(
            sigma_sq.reshape(n, c, p2)))) * r_sum.reshape(n, c, 1)
        cost_h = jnp.sum(cost_h, axis=2)                     # (N, C)
        cost_mean = jnp.mean(cost_h, axis=1, keepdims=True)
        cost_stdv = jnp.sqrt(
            jnp.sum(cost_h - cost_mean, axis=1, keepdims=True) ** 2 / c
            + eps)
        a_out = jax.nn.sigmoid(
            lam * (beta_a[None] - (cost_mean - cost_h) / (cost_stdv + eps)))
        if it < iters - 1:
            ln_p = (-((votes - mu) ** 2) / (2 * sigma_sq)
                    - jnp.log(jnp.sqrt(sigma_sq)) - 0.5 * ln_2pi)
            ln_ap = jnp.sum(ln_p, axis=3) + jnp.log(
                eps + a_out[:, None, :])
            r = jax.nn.softmax(ln_ap, axis=2)
    return mu.reshape(n, c, p2), a_out


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
