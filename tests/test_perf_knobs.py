"""Round-3 performance knobs: numerics contracts.

- remat_policy ("dots"/"dots_batch"/"dots_attn", models/layers.remat_class):
  rematerialization must never change gradients — policies only choose what
  is saved vs recomputed.
- aug_dtype / bf16 frames pipeline (DataConfig.aug_dtype): the bf16
  augmentation path must track the f32 path within pixel-quantization
  tolerance (uint8 pixels are exact in bf16; each op rounds at ~1/256).
"""

import numpy as np
import pytest


def _batch(cfg):
    d, e = cfg.data, cfg.encoder
    rng = np.random.RandomState(0)
    b = 2
    return {
        "input_ids": rng.randint(
            1, e.vocab_size, (b, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((b, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((b, d.max_seq_length), np.int32),
        "visual_feats": rng.randn(
            b, e.visual_t, e.visual_hw, e.visual_hw,
            e.visual_feat_dim).astype(np.float32),
        "visual_mask": np.ones((b, e.visual_seq_length), np.int32),
        "rel_labels": rng.randint(
            1, cfg.num_rel_classes + 1,
            (b, d.num_situations, d.num_rel)).astype(np.int32),
        "rel_lengths": np.full((b, d.num_situations), d.num_rel, np.int32),
        "act_labels": rng.randint(
            1, cfg.num_act_classes + 1,
            (b, d.num_situations, d.num_act)).astype(np.int32),
        "act_lengths": np.full((b, d.num_situations), d.num_act, np.int32),
        "target": np.eye(cfg.num_answers, dtype=np.float32)[
            rng.randint(cfg.num_answers, size=b)],
    }


@pytest.mark.parametrize("policy", ["", "dots", "dots_batch", "dots_attn"])
def test_remat_policy_grads_match(policy):
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.step import compute_losses

    base = tiny_test_config(task="hgqa").replace(compute_dtype="float32")
    batch = _batch(base)

    def grads(cfg):
        m = ShgVqaModel(cfg)
        p = m.init(jax.random.PRNGKey(0), batch, deterministic=True)

        def loss(pp):
            out = m.apply(pp, batch, deterministic=True)
            return compute_losses(cfg, out, batch)[0]

        return p, jax.jit(jax.grad(loss))(p)

    p0, g0 = grads(base)
    p1, g1 = grads(base.replace(remat=True, remat_policy=policy))
    # same init (same module structure), same gradients
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_bf16_rand_augment_tracks_f32():
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.data.transforms import rand_augment_batch

    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (4, 4, 32, 32, 3), np.uint8)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)

    out32 = np.asarray(rand_augment_batch(
        jnp.asarray(frames, jnp.float32) / 255.0, keys, eq_stride=1))
    out16 = np.asarray(rand_augment_batch(
        jnp.asarray(frames, jnp.bfloat16) / jnp.bfloat16(255.0), keys,
        eq_stride=1).astype(jnp.float32))
    assert np.isfinite(out16).all()
    # pixel-level agreement: bf16 rounds at ~1/256 per op; geometry lerps
    # and reductions compound it slightly, equalize's histogram can shift a
    # bin boundary on a handful of pixels
    diff = np.abs(out32 - out16)
    assert np.median(diff) <= 1.5 / 255.0, float(np.median(diff))
    assert (diff < 16.0 / 255.0).mean() > 0.99, float(diff.max())


def test_model_pixel_pipeline_dtype_follows_config():
    """VideoShgVqaModel converts uint8 frames at aug_dtype (default: the
    compute dtype) — f32 under float32 compute, bf16 under bf16 compute."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel, _dt

    cfg = tiny_test_config(task="hgqa")
    assert _dt(cfg.data.aug_dtype or cfg.compute_dtype) == (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32)
    cfg2 = cfg.replace(
        data=dataclasses.replace(cfg.data, aug_dtype="float32"))
    assert _dt(cfg2.data.aug_dtype or cfg2.compute_dtype) == jnp.float32
