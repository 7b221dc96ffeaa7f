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


def test_train_kernel_rate0_matches_reference(force_interpret):
    """dropout 0: the training kernel is the deterministic math."""
    import jax

    args = _data(m=96, d=64, f=128)
    got = pallas_ffn.fused_ffn_train(*args, dropout_rate=0.0,
                                     dropout_rng=None, interpret=True)
    want = pallas_ffn._reference(
        args[0], args[1], args[2].reshape(1, -1), args[3],
        args[4].reshape(1, -1), args[5].reshape(1, -1),
        args[6].reshape(1, -1), 1e-12)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_train_kernel_rate0_grads_match_autodiff(force_interpret):
    import jax

    x, w1, b1, w2, b2, gamma, beta = _data(m=32, d=32, f=64,
                                           dtype=jnp.float32)

    def f_fused(x, w1, w2, gamma):
        return jnp.sum(pallas_ffn.fused_ffn_train(
            x, w1, b1, w2, b2, gamma, beta, dropout_rate=0.0,
            dropout_rng=None, interpret=True) ** 2)

    def f_ref(x, w1, w2, gamma):
        return jnp.sum(pallas_ffn._reference(
            x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
            gamma.reshape(1, -1), beta.reshape(1, -1), 1e-12) ** 2)

    got = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, w1, w2, gamma)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, w1, w2, gamma)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-3, rtol=2e-3)


def test_train_kernel_dropout_statistics_and_reproducibility(
        force_interpret):
    import jax

    if jax.devices()[0].platform not in ("tpu", "axon"):
        pytest.skip("pltpu.prng_seed has no CPU interpret lowering; the "
                    "dropout path is validated on-chip (tools/bench_pallas)")

    x, w1, b1, w2, b2, gamma, beta = _data(m=256, d=64, f=128,
                                           dtype=jnp.float32)
    key = jax.random.PRNGKey(5)

    def run(k):
        return pallas_ffn.fused_ffn_train(
            x, w1, b1, w2, b2, gamma, beta, dropout_rate=0.3,
            dropout_rng=k, interpret=True)

    y1, y2 = run(key), run(key)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = run(jax.random.PRNGKey(6))
    assert not np.array_equal(np.asarray(y1), np.asarray(y3))
    # expectation over many seeds approaches the deterministic output
    det = pallas_ffn.fused_ffn_train(
        x, w1, b1, w2, b2, gamma, beta, dropout_rate=0.0,
        dropout_rng=None, interpret=True)
    acc = np.zeros_like(np.asarray(det))
    n = 24
    for i in range(n):
        acc += np.asarray(run(jax.random.PRNGKey(100 + i)))
    # LN is nonlinear, so only approximate agreement is expected
    assert np.mean(np.abs(acc / n - np.asarray(det))) < 0.25

    # grads: reproducible under the same key (bwd reseeds the same mask)
    g1 = jax.grad(lambda xx: jnp.sum(run_g(xx, key) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(run_g(xx, key) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.isfinite(np.asarray(g1)).all()


def run_g(x, key):
    from shgvqa_tpu.kernels import ffn as pallas_ffn

    rng = np.random.RandomState(0)
    _, w1, b1, w2, b2, gamma, beta = _data(m=256, d=64, f=128,
                                           dtype=jnp.float32)
    return pallas_ffn.fused_ffn_train(
        x, w1, b1, w2, b2, gamma, beta, dropout_rate=0.3,
        dropout_rng=key, interpret=True)


def test_ffn_module_train_path_uses_kernel(force_interpret):
    """With enable_train on, the module's stochastic path runs the fused
    kernel and stays differentiable through flax (dropout 0 on CPU — the
    PRNG primitive is TPU-only)."""
    import jax

    pallas_ffn.enable_train(True)
    try:
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 20, 64) * 0.5, jnp.float32)
        mod = FFN(intermediate_size=128, dropout=0.0, dtype=jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x, deterministic=True)

        def loss(p):
            y = mod.apply(p, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
    finally:
        pallas_ffn.enable_train(False)


def test_fused_out_ln_differentiable(force_interpret):
    import jax

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(16, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 32) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    res = jnp.asarray(rng.randn(16, 32), jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.randn(32), jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(32), jnp.float32)

    def f_fused(x, w):
        return jnp.sum(pallas_ffn.fused_out_ln(
            x, w, b, res, gamma, beta, interpret=True) ** 2)

    def f_ref(x, w):
        return jnp.sum(pallas_ffn._out_ln_reference(
            x, w, b.reshape(1, -1), res, gamma.reshape(1, -1),
            beta.reshape(1, -1), 1e-12) ** 2)

    for got, want in zip(jax.grad(f_fused, argnums=(0, 1))(x, w),
                         jax.grad(f_ref, argnums=(0, 1))(x, w)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
