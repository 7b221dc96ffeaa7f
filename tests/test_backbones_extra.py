import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgvqa_tpu.models.backbone import make_backbone
from shgvqa_tpu.models.backbones_extra import ResNeXt101, SlowFastR50


@pytest.mark.slow
def test_resnext101_per_frame_geometry():
    m = ResNeXt101(depths=(1, 1, 1, 1), groups=4, width_per_group=4)
    x = jnp.zeros((1, 2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 2, 2, 2, 2048)


@pytest.mark.slow
def test_slowfast_r50_geometry():
    m = SlowFastR50(depths=(1, 1, 1, 1))
    x = jnp.zeros((1, 8, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # fast temporal rate preserved (T=8); spatial 64/32 = 2; 2048+256 ch
    assert out.shape == (1, 8, 2, 2, 2048 + 256)


def test_mvit_geometry():
    from shgvqa_tpu.models.mvit import MViTB
    import jax, jax.numpy as jnp

    m = MViTB(embed_dim=8, depth=4, num_heads=1, stage_blocks=(1, 2, 3),
              kv_stride=(1, 4, 4))
    x = jnp.zeros((1, 8, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == (1, 4, 2, 2, 64)


def test_registry_names():
    for name in ("slow_r50", "resnext101", "slowfast_r50", "slowfast_r101",
                 "mvit_B"):
        assert make_backbone(name) is not None
    with pytest.raises(NotImplementedError):
        make_backbone("video_swin")
