import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgvqa_tpu.models.backbone import SlowR50, make_backbone


def test_slow_r50_feature_geometry_small():
    """Same topology at reduced spatial size: 32px input -> 1x1 spatial
    (32/32), T preserved, 2048 channels."""
    model = SlowR50()
    x = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 1, 1, 2048)


@pytest.mark.slow
def test_slow_r50_reference_geometry():
    """(B, 16, 224, 224, 3) -> (B, 16, 7, 7, 2048), the exact feature map the
    reference feeds its conv tokenizer (modeling_capsbert.py:989-996)."""
    model = SlowR50()
    x = jnp.zeros((1, 16, 224, 224, 3))
    params = jax.eval_shape(
        lambda k: model.init(k, x), jax.random.PRNGKey(0))
    out = jax.eval_shape(lambda p: model.apply(p, x), params)
    assert out.shape == (1, 16, 7, 7, 2048)


def test_unknown_backbone_raises():
    with pytest.raises(NotImplementedError):
        make_backbone("video_swin")


def test_space_to_depth_stem_exact():
    """The s2d stem must compute the same function as the plain
    conv(1,7,7)/s(1,2,2)/pad3 stem for any kernel (MLPerf trick, exact)."""
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.models.backbone import space_to_depth_stem

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 32, 28, 3), jnp.float32)
    k = jnp.asarray(rng.randn(1, 7, 7, 3, 8) * 0.1, jnp.float32)
    plain = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 2, 2),
        padding=((0, 0), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    s2d = space_to_depth_stem(x, k, jnp.float32)
    assert s2d.shape == plain.shape
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(plain),
                               atol=1e-4, rtol=1e-4)


def test_space_to_depth_stem_temporal_kernel():
    """kT=5 (the SlowFast fast stem) goes through the same transform."""
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.models.backbone import space_to_depth_stem

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 16, 16, 3), jnp.float32)
    k = jnp.asarray(rng.randn(5, 7, 7, 3, 4) * 0.1, jnp.float32)
    plain = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 2, 2),
        padding=((2, 2), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    s2d = space_to_depth_stem(x, k, jnp.float32)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(plain),
                               atol=1e-4, rtol=1e-4)
