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
