"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from shgvqa_tpu.configs.config import MeshConfig, tiny_test_config
from shgvqa_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    partition_params,
    shard_batch,
)


def test_eight_cpu_devices_available():
    assert jax.device_count() >= 8


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh_dp = make_mesh(MeshConfig())
    assert mesh_dp.shape["data"] == 8


def test_partition_params_tp_rules():
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    params = {
        "attention": {"query": {"kernel": jnp.zeros((32, 32))}},
        "ffn": {"intermediate": {"dense": {"kernel": jnp.zeros((32, 64))}},
                "output": {"dense": {"kernel": jnp.zeros((64, 32))}}},
        "ln": {"scale": jnp.zeros((32,))},
    }
    shardings = partition_params(params, mesh)
    assert shardings["attention"]["query"]["kernel"].spec == P(None, "model")
    assert shardings["ffn"]["intermediate"]["dense"]["kernel"].spec == \
        P(None, "model")
    assert shardings["ffn"]["output"]["dense"]["kernel"].spec == \
        P("model", None)
    assert shardings["ln"]["scale"].spec == P()


def test_partition_falls_back_when_indivisible():
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    params = {"attention": {"query": {"kernel": jnp.zeros((3, 5))}}}
    shardings = partition_params(params, mesh)
    assert shardings["attention"]["query"]["kernel"].spec == P()


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(MeshConfig())
    batch = {"x": np.zeros((16, 4), np.float32), "ques_id": ["a"] * 16}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == batch_sharding(mesh)
    assert sharded["ques_id"] == ["a"] * 16


@pytest.mark.slow
def test_data_parallel_train_step_matches_single_device():
    """The sharded train step must be numerically consistent with the
    unsharded one (same batch, same rng)."""
    import optax

    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses

    cfg = tiny_test_config(task="vqa")
    model = ShgVqaModel(cfg)
    tx = make_optimizer(lr=1e-3, t_total=10, warmup=0.1)

    rng = np.random.RandomState(0)
    b = 8
    d, e = cfg.data, cfg.encoder
    t_in = e.visual_t + 8
    tgt = np.zeros((b, cfg.num_answers), np.float32)
    tgt[np.arange(b), rng.randint(cfg.num_answers, size=b)] = 1.0
    batch = {
        "input_ids": rng.randint(1, e.vocab_size,
                                 (b, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((b, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((b, d.max_seq_length), np.int32),
        "visual_feats": rng.randn(b, t_in, e.visual_hw, e.visual_hw,
                                  e.visual_feat_dim).astype(np.float32),
        "visual_mask": np.ones((b, e.visual_seq_length), np.int32),
        "target": tgt,
    }

    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    opt_state = tx.init(params)

    def loss_fn(p, bb):
        out = model.apply(p, bb, deterministic=True)
        return compute_losses(cfg, out, bb)

    def train_step(p, o, bb):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bb)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), metrics

    # single device
    p1, m1 = jax.jit(train_step)(params, opt_state, batch)

    # data-parallel over 8 devices
    mesh = make_mesh(MeshConfig())
    with mesh:
        sharded_batch = shard_batch(batch, mesh)
        p2, m2 = jax.jit(train_step)(params, opt_state, sharded_batch)

    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, bb_ in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=2e-5, atol=2e-6)


def test_tp_rules_cover_real_model_params():
    """The TP regexes must keep matching the REAL param tree (they are
    path-sensitive; a rename in models/ would silently degrade TP to full
    replication).  Asserts every attention qkv/out and FFN kernel in the
    encoder gets a model-axis spec, and that a substantial element fraction
    of the head is sharded at tp=2."""
    import numpy as np
    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.models.shgvqa import ShgVqaModel

    cfg = tiny_test_config(task="hgqa")
    model = ShgVqaModel(cfg)
    d, e = cfg.data, cfg.encoder
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(1, e.vocab_size,
                                 (2, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((2, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((2, d.max_seq_length), np.int32),
        "visual_feats": rng.randn(2, e.visual_t + 8, e.visual_hw,
                                  e.visual_hw, e.visual_feat_dim
                                  ).astype(np.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    shardings = partition_params(params, mesh)

    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(shardings)
    sharded_elems = total_elems = 0
    missed = []
    for (kp, leaf), sh in zip(flat_p, flat_s):
        path = "/".join(getattr(k, "key", getattr(k, "idx", "?")).__str__()
                        for k in kp)
        n = int(np.prod(leaf.shape)) if leaf.ndim else 1
        total_elems += n
        if "model" in (ax for ax in sh.spec if ax):
            sharded_elems += n
        elif (leaf.ndim == 2 and path.endswith("kernel")
              and any(t in path for t in ("query", "key", "value",
                                          "intermediate", "in_proj",
                                          "out_proj", "linear1", "linear2"))):
            missed.append(path)
    assert not missed, f"TP rules stopped matching: {missed[:5]}"
    assert sharded_elems / total_elems > 0.3, (
        f"only {sharded_elems/total_elems:.1%} of elements TP-sharded")
