import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgvqa_tpu.data.transforms import (
    NORM_STATS,
    op_autocontrast,
    op_brightness,
    op_equalize,
    op_rotate,
    op_solarize,
    op_translate_x,
    preprocess_and_augment,
    preprocess_clip,
    rand_augment,
    uniform_temporal_subsample,
)


def test_preprocess_clip_shapes_and_stats():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (9, 48, 64, 3), np.uint8)
    out = np.asarray(preprocess_clip(jnp.asarray(frames), 4, 32))
    assert out.shape == (4, 32, 32, 3)
    mean, std = NORM_STATS["slow_r50"]
    # uniform noise in [0,1): post-normalize mean ~ (0.5-0.45)/0.225
    assert abs(out.mean() - (0.5 - mean[0]) / std[0]) < 0.05


def test_uniform_temporal_subsample_matches_featurize():
    from shgvqa_tpu.data.featurize import uniform_subsample_indices

    frames = jnp.arange(9 * 2).reshape(9, 2).astype(jnp.float32)
    out = np.asarray(uniform_temporal_subsample(frames, 4))
    idx = uniform_subsample_indices(9, 4)
    np.testing.assert_array_equal(out, np.asarray(frames)[idx])


def test_color_ops_bounded():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    for op, v in [
        (op_brightness, 0.5), (op_brightness, -0.5),
        (op_solarize, 0.3), (op_autocontrast, 0.0), (op_equalize, 0.0),
    ]:
        y = np.asarray(op(x, jnp.asarray(v)))
        assert y.shape == x.shape
        assert y.min() >= -1e-6 and y.max() <= 1 + 1e-6


def test_autocontrast_stretches_range():
    x = jnp.full((1, 8, 8, 3), 0.5).at[0, 0, 0, :].set(0.4).at[0, 1, 1, :].set(0.6)
    y = np.asarray(op_autocontrast(x, 0.0))
    assert y.min() == pytest.approx(0.0, abs=1e-5)
    assert y.max() == pytest.approx(1.0, abs=1e-5)


def test_rotate_identity_at_zero():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 12, 12, 3), jnp.float32)
    y = np.asarray(op_rotate(x, jnp.asarray(0.0)))
    np.testing.assert_allclose(y, np.asarray(x), atol=1e-5)


def test_translate_shifts_content():
    x = jnp.zeros((1, 8, 8, 1)).at[0, :, 2, 0].set(1.0)
    # translate right by 2/8 of width -> column 4 (inverse map: src = x - px
    # ... verify mass moved, border zero-filled)
    y = np.asarray(op_translate_x(x, jnp.asarray(-0.25)))
    assert y[0, :, 4, 0].sum() == pytest.approx(8.0, abs=1e-4)
    assert np.asarray(x)[0].sum() == pytest.approx(y[0].sum(), abs=1e-3)


def test_rand_augment_deterministic_given_key():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(3, 16, 16, 3), jnp.float32)
    k = jax.random.PRNGKey(42)
    y1 = np.asarray(rand_augment(x, k))
    y2 = np.asarray(rand_augment(x, k))
    np.testing.assert_array_equal(y1, y2)
    y3 = np.asarray(rand_augment(x, jax.random.PRNGKey(43)))
    # overwhelmingly likely to differ
    assert not np.array_equal(y1, y3)


def test_preprocess_and_augment_full():
    rng = np.random.RandomState(4)
    frames = rng.randint(0, 256, (10, 40, 40, 3), np.uint8)
    out = np.asarray(preprocess_and_augment(
        jnp.asarray(frames), jax.random.PRNGKey(0), 4, 32))
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(out).all()


def test_rand_augment_batch_matches_vmapped_per_clip():
    """The batched formulation must sample and transform exactly like
    vmap(rand_augment) (eq_stride=1 makes equalize exact)."""
    import jax

    from shgvqa_tpu.data.transforms import rand_augment, rand_augment_batch

    rng = np.random.RandomState(0)
    frames = rng.rand(6, 3, 24, 20, 3).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    ref = jax.vmap(rand_augment)(jnp.asarray(frames), keys)
    got = rand_augment_batch(jnp.asarray(frames), keys, eq_stride=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_rand_augment_batch_many_keys_cover_all_ops():
    """Sweep enough clips that every op id is sampled at least once in some
    layer (14 ops, 64 clips x 2 layers), and outputs stay in [0, 1]."""
    import jax

    from shgvqa_tpu.data.transforms import (
        _sample_rand_augment,
        rand_augment,
        rand_augment_batch,
    )

    keys = jax.random.split(jax.random.PRNGKey(3), 64)
    ops, applies, _ = jax.vmap(
        lambda k: _sample_rand_augment(k, 2, 0.5))(keys)
    effective = np.where(np.asarray(applies), np.asarray(ops), 0)
    assert len(np.unique(effective)) >= 12, np.unique(effective)

    rng = np.random.RandomState(1)
    frames = rng.rand(64, 2, 16, 16, 3).astype(np.float32)
    ref = jax.vmap(rand_augment)(jnp.asarray(frames), keys)
    got = rand_augment_batch(jnp.asarray(frames), keys, eq_stride=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert float(jnp.min(got)) >= 0.0 and float(jnp.max(got)) <= 1.0


def test_equalize_batch_strided_close_to_exact():
    """eq_stride>1 estimates the histogram from a subsample; the LUT must
    stay close to the exact one on natural-ish images."""
    from shgvqa_tpu.data.transforms import op_equalize_batch

    rng = np.random.RandomState(2)
    # smooth-ish image: random walks, so histograms are non-degenerate;
    # CDF-from-subsample error ~ 1/sqrt(samples) => 4k samples ~ 1.6%
    base = np.cumsum(rng.randn(2, 4, 64, 64, 3), axis=2)
    base = (base - base.min()) / (base.max() - base.min())
    x = jnp.asarray(base.astype(np.float32))
    exact = np.asarray(op_equalize_batch(x, stride=1))
    approx = np.asarray(op_equalize_batch(x, stride=4))
    assert np.mean(np.abs(exact - approx)) < 0.04


def test_aug_mix_batch_matches_vmapped_per_clip():
    import jax

    from shgvqa_tpu.data.transforms import aug_mix, aug_mix_batch

    rng = np.random.RandomState(4)
    frames = rng.rand(4, 2, 16, 16, 3).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    ref = jax.vmap(aug_mix)(jnp.asarray(frames), keys)
    got = aug_mix_batch(jnp.asarray(frames), keys, eq_stride=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_aug_mix_fold_chains_bit_identical():
    """The width*B folded-chain execution (the default, round-4 perf work)
    must be BIT-identical to the sequential per-chain form — same per-clip
    keys, same layer order, same weighted accumulation order."""
    import jax

    from shgvqa_tpu.data.transforms import aug_mix_batch

    rng = np.random.RandomState(9)
    frames = rng.rand(6, 2, 16, 16, 3).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), 6)
    folded = aug_mix_batch(jnp.asarray(frames), keys, fold_chains=True)
    seq = aug_mix_batch(jnp.asarray(frames), keys, fold_chains=False)
    np.testing.assert_array_equal(np.asarray(folded), np.asarray(seq))


def test_three_shear_rotate_close_to_bilinear():
    """op_rotate uses the Paeth 3-shear decomposition (TPU-friendly 1-D
    passes); bound its divergence from the 2-D bilinear oracle."""
    from shgvqa_tpu.data.transforms import _affine_warp, op_rotate

    rng = np.random.RandomState(5)
    base = np.cumsum(np.cumsum(rng.randn(2, 32, 32, 3), axis=1), axis=2)
    base = (base - base.min()) / (base.max() - base.min())
    x = jnp.asarray(base.astype(np.float32))
    deg = 8.7   # RandAugment magnitude 9/31 * 30
    rad = np.deg2rad(deg)
    oracle = _affine_warp(x, jnp.asarray(
        [[np.cos(rad), np.sin(rad), 0.0],
         [-np.sin(rad), np.cos(rad), 0.0]], dtype=np.float32))
    got = op_rotate(x, jnp.float32(deg))
    # interior agrees closely; borders differ by fill handling
    diff = np.abs(np.asarray(got - oracle))[:, 4:-4, 4:-4]
    assert np.mean(diff) < 0.01, np.mean(diff)
    assert np.max(diff) < 0.2, np.max(diff)


def test_subbatch_layer_matches_full_and_overflow_falls_back():
    """The fixed-capacity sub-batch aug layer is bit-equal to the full-batch
    formulation, and capacity overflow routes through lax.cond to the full
    path (exactness on EVERY step, not just typical ones)."""
    import jax

    from shgvqa_tpu.data.transforms import _apply_layer_batch, _class_cap

    rng = np.random.RandomState(6)
    b = 16
    x = jnp.asarray(rng.rand(b, 2, 24, 24, 3).astype(np.float32))
    sign = jnp.asarray(rng.choice([-1.0, 1.0], size=b).astype(np.float32))
    apply = jnp.ones((b,), bool)

    # typical mix: spans photometric, equalize, sharpness, and geometry
    op_mix = jnp.asarray(rng.randint(0, 14, size=b).astype(np.int32))
    # all-geometry: count 16 > _class_cap(16, 5/14) -> overflow fallback
    op_geo = jnp.asarray(np.full(b, 3, np.int32))
    assert b > _class_cap(b, 5.0 / 14.0)

    for ops in (op_mix, op_geo):
        full = _apply_layer_batch(x, ops, apply, sign, 9, 1,
                                  apply_prob=1.0, subbatch=False)
        sub = _apply_layer_batch(x, ops, apply, sign, 9, 1,
                                 apply_prob=1.0, subbatch=True)
        np.testing.assert_allclose(np.asarray(sub), np.asarray(full),
                                   atol=1e-6, rtol=1e-6)
