"""Fused FFN kernel (kernels/ffn.py): parity with the unfused module path
(interpret mode on CPU; on-chip validation in tools/bench_pallas.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgvqa_tpu.kernels import ffn as pallas_ffn
from shgvqa_tpu.models.layers import FFN


@pytest.fixture()
def force_interpret():
    pallas_ffn.enable(True)
    pallas_ffn._FORCE_INTERPRET = True
    yield
    pallas_ffn.enable(False)
    pallas_ffn._FORCE_INTERPRET = False


def _data(m=200, d=64, f=256, seed=0, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(m, d) * 0.5, dtype)
    w1 = jnp.asarray(rng.randn(d, f) * 0.05, dtype)
    b1 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(f, d) * 0.05, dtype)
    b2 = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(d), jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(d), jnp.float32)
    return x, w1, b1, w2, b2, gamma, beta


def test_kernel_matches_reference_math(force_interpret):
    args = _data()
    got = pallas_ffn.fused_ffn(*args, interpret=True)
    want = pallas_ffn._reference(
        args[0], args[1], args[2].reshape(1, -1), args[3],
        args[4].reshape(1, -1), args[5].reshape(1, -1),
        args[6].reshape(1, -1), 1e-12)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_kernel_handles_unaligned_rows(force_interpret):
    # M=7 not a multiple of the 128-row block: zero-padded tail dropped
    args = _data(m=7)
    got = pallas_ffn.fused_ffn(*args, interpret=True)
    assert got.shape == (7, 64)
    want = pallas_ffn._reference(
        args[0], args[1], args[2].reshape(1, -1), args[3],
        args[4].reshape(1, -1), args[5].reshape(1, -1),
        args[6].reshape(1, -1), 1e-12)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_ffn_module_kernel_path_matches_unfused(force_interpret):
    """The module branch (weights recovered via dense(I)-dense(0)) must
    match the unfused deterministic forward bit-close in bf16."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 37, 64) * 0.5, jnp.bfloat16)
    mod = FFN(intermediate_size=256, dropout=0.1, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x, deterministic=True)

    fused = mod.apply(params, x, deterministic=True)
    pallas_ffn.enable(False)
    unfused = mod.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(unfused, np.float32),
                               atol=3e-2, rtol=3e-2)
    # same parameter tree either way
    pallas_ffn.enable(True)
    params2 = mod.init(jax.random.PRNGKey(0), x, deterministic=True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))


def test_fused_ffn_differentiable(force_interpret):
    """custom VJP recompute path: grads match autodiff of the jnp oracle."""
    x, w1, b1, w2, b2, gamma, beta = _data(m=16, d=32, f=64,
                                           dtype=jnp.float32)

    def f_fused(x, w1):
        return jnp.sum(pallas_ffn.fused_ffn(
            x, w1, b1, w2, b2, gamma, beta, interpret=True) ** 2)

    def f_ref(x, w1):
        return jnp.sum(pallas_ffn._reference(
            x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
            gamma.reshape(1, -1), beta.reshape(1, -1), 1e-12) ** 2)

    gx, gw = jax.grad(f_fused, argnums=(0, 1))(x, w1)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, w1)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               atol=1e-4, rtol=1e-4)
