"""BertAdam parity vs a spec-derived numpy implementation of the reference
update rule (optimization.py:116-178):
    m = b1*m + (1-b1)*g;  v = b2*v + (1-b2)*g^2
    update = m/(sqrt(v)+eps) + wd*p
    p -= lr*sched(step/t_total)*update   (step read BEFORE increment)
with NO bias correction."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from shgvqa_tpu.train.optimizer import (
    bert_adam,
    make_optimizer,
    warmup_constant,
    warmup_linear,
)


def _numpy_bert_adam(params, grads_seq, lr, t_total, warmup, wd,
                     b1=0.9, b2=0.999, eps=1e-6):
    p = params.copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    step = 0
    for g in grads_seq:
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        upd = m / (np.sqrt(v) + eps) + wd * p
        x = step / t_total
        sched = x / warmup if x < warmup else max((x - 1) / (warmup - 1), 0)
        p = p - lr * sched * upd
        step += 1
    return p


def test_bert_adam_matches_reference_update_rule():
    rng = np.random.RandomState(0)
    p0 = rng.randn(5).astype(np.float32)
    grads = [rng.randn(5).astype(np.float32) for _ in range(7)]
    lr, t_total, warmup, wd = 0.1, 10, 0.3, 0.01

    tx = bert_adam(lr, t_total, warmup, weight_decay=wd)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    expected = _numpy_bert_adam(p0.astype(np.float64), grads, lr, t_total,
                                warmup, wd)
    np.testing.assert_allclose(np.asarray(params["w"]), expected,
                               rtol=1e-4, atol=1e-5)


def test_first_step_is_noop_with_warmup_linear():
    """sched(0) == 0 -> the very first update leaves params unchanged
    (reference quirk: state['step'] read before increment)."""
    tx = bert_adam(1.0, t_total=100, warmup=0.1)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.ones((3,))}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)
    # second step moves
    updates2, _ = tx.update({"w": jnp.ones((3,))}, state, params)
    assert np.abs(np.asarray(updates2["w"])).max() > 0


def test_schedule_shapes():
    xs = jnp.asarray([0.0, 0.05, 0.1, 0.5, 1.0, 1.5])
    lin = np.asarray(warmup_linear(xs, 0.1))
    np.testing.assert_allclose(lin, [0.0, 0.5, 1.0, 5 / 9, 0.0, 0.0],
                               rtol=1e-6)
    const = np.asarray(warmup_constant(xs, 0.1))
    np.testing.assert_allclose(const, [0.0, 0.5, 1.0, 1.0, 1.0, 1.0])


def test_global_norm_clip_composes():
    """The clip stage must feed CLIPPED gradients into BertAdam: with a raw
    gradient of global norm 200 clipped to 1, the accumulated second moment
    reflects per-element 0.5 (=100/200), not 100 (Adam's update itself is
    scale-invariant, so inspect the state, not the update)."""
    for flat in (False, True):
        tx = make_optimizer(lr=1.0, t_total=10, warmup=0.1, grad_clip=1.0,
                            flat=flat)
        params = {"w": jnp.zeros((4,))}
        state = tx.init(params)
        big = {"w": jnp.full((4,), 100.0)}
        _, state = tx.update(big, state, params)
        adam_state = state[1] if not flat else state
        if flat:
            # flat state is lane-padded (N/256, 256); real entries first
            v = np.asarray(adam_state.v).reshape(-1)[:4]
        else:
            v = np.asarray(adam_state.v["w"])
        expected_v = 0.001 * 0.5 ** 2  # (1-b2) * (100/200)^2 per element
        np.testing.assert_allclose(v, expected_v, rtol=1e-4)


def test_trainable_mask_freezes_subtree():
    params = {"backbone": jnp.ones((2,)), "head": jnp.ones((2,))}
    mask = {"backbone": False, "head": True}
    tx = make_optimizer(lr=0.5, t_total=4, warmup=0.25, trainable_mask=mask)
    state = tx.init(params)
    g = {"backbone": jnp.ones((2,)), "head": jnp.ones((2,))}
    for _ in range(3):
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["backbone"]), 1.0)
    assert np.abs(np.asarray(params["head"]) - 1.0).max() > 0


def test_flat_matches_per_leaf_over_steps():
    """bert_adam_flat must be numerically identical to the per-leaf
    composition, with and without freezing."""
    rng = np.random.RandomState(0)
    params = {"a": jnp.asarray(rng.randn(5, 3), jnp.float32),
              "b": {"c": jnp.asarray(rng.randn(4), jnp.float32)}}
    mask = {"a": True, "b": {"c": False}}
    for m in (None, mask):
        t1 = make_optimizer(0.1, 20, 0.2, trainable_mask=m, flat=False)
        t2 = make_optimizer(0.1, 20, 0.2, trainable_mask=m, flat=True)
        p1 = jax.tree_util.tree_map(lambda x: x, params)
        p2 = jax.tree_util.tree_map(lambda x: x, params)
        s1, s2 = t1.init(p1), t2.init(p2)
        for i in range(6):
            scale = 10.0 if i % 2 else 0.01
            g = jax.tree_util.tree_map(
                lambda x: jnp.asarray(rng.randn(*x.shape) * scale,
                                      jnp.float32), params)
            u1, s1 = t1.update(g, s1, p1)
            p1 = optax.apply_updates(p1, u1)
            u2, s2 = t2.update(g, s2, p2)
            p2 = optax.apply_updates(p2, u2)
        for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                          jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=2e-5, atol=1e-6)


# -- non-BertAdam path: --optim rms|adam|adamax|sgd -----------------------
# The reference binds a stock torch optimizer with only (params, lr)
# (param.py:11-30, agqaHGQA.py:157); global-norm clip 5.0 still happens in
# the train loop (agqaHGQA.py:391).  Parity is checked against the ACTUAL
# torch optimizers, trajectory-wise.

@pytest.mark.parametrize("name", ["adam", "adamax", "rms", "sgd"])
def test_plain_optimizer_matches_torch_trajectory(name):
    torch = pytest.importorskip("torch")
    from shgvqa_tpu.train.optimizer import plain_optimizer

    torch_ctor = {
        "adam": torch.optim.Adam,
        "adamax": torch.optim.Adamax,
        "rms": torch.optim.RMSprop,
        "sgd": torch.optim.SGD,
    }[name]
    rng = np.random.RandomState(42)
    shapes = [(5, 3), (7,), (2, 2, 2)]
    p0 = [rng.randn(*s).astype(np.float32) for s in shapes]
    grads = [[rng.randn(*s).astype(np.float32) for s in shapes]
             for _ in range(6)]
    lr = 0.07

    tp = [torch.nn.Parameter(torch.tensor(p)) for p in p0]
    topt = torch_ctor(tp, lr)
    for gs in grads:
        for p, g in zip(tp, gs):
            p.grad = torch.tensor(g)
        topt.step()

    tx = plain_optimizer(name, lr)
    params = {f"p{i}": jnp.asarray(p) for i, p in enumerate(p0)}
    state = tx.init(params)
    for gs in grads:
        g = {f"p{i}": jnp.asarray(x) for i, x in enumerate(gs)}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)

    for i, p in enumerate(tp):
        np.testing.assert_allclose(
            np.asarray(params[f"p{i}"]), p.detach().numpy(),
            rtol=3e-5, atol=1e-6)


def test_make_optimizer_nonbert_clips_and_matches_torch():
    """make_optimizer(name='adam') == clip_grad_norm_(5.0) + torch.Adam."""
    torch = pytest.importorskip("torch")

    rng = np.random.RandomState(7)
    p0 = rng.randn(6).astype(np.float32)
    # one huge gradient exercises the clip, small ones leave it inert
    grads = [rng.randn(6).astype(np.float32) * s for s in (40.0, 0.1, 3.0)]
    lr = 0.05

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr)
    for g in grads:
        tp.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([tp], 5.0)
        topt.step()

    tx = make_optimizer(lr=lr, t_total=100, name="adam")
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=3e-5, atol=1e-6)


def test_make_optimizer_nonbert_respects_trainable_mask():
    params = {"backbone": jnp.ones((2,)), "head": jnp.ones((2,))}
    mask = {"backbone": False, "head": True}
    tx = make_optimizer(lr=0.5, t_total=4, trainable_mask=mask, name="sgd")
    state = tx.init(params)
    g = {"backbone": jnp.ones((2,)), "head": jnp.ones((2,))}
    updates, state = tx.update(g, state, params)
    params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["backbone"]), 1.0)
    np.testing.assert_allclose(np.asarray(params["head"]), 0.5)


def test_plain_optimizer_unknown_name_raises():
    from shgvqa_tpu.train.optimizer import plain_optimizer

    with pytest.raises(ValueError, match="unknown optimizer"):
        plain_optimizer("adagrad", 0.1)


def test_connected_param_mask_by_task():
    """torch BertAdam skips None-grad params (optimization.py:131-132);
    connected_param_mask encodes which subtrees are grad-disconnected per
    task so the product optimizer masks them (no update, no weight decay).
    Flagship-dims proof vs torch lives in
    tests/test_reference_checkpoint_import.py::
    test_flagship_dims_train_step_parity."""
    import dataclasses

    import jax

    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.step import connected_param_mask

    def build(task, **cfg_kw):
        cfg = tiny_test_config(task=task)
        if cfg_kw:
            cfg = cfg.replace(**cfg_kw)
        model = ShgVqaModel(cfg)
        e, d = cfg.encoder, cfg.data
        b = 2
        batch = {
            "input_ids": np.ones((b, d.max_seq_length), np.int32),
            "input_mask": np.ones((b, d.max_seq_length), np.int32),
            "segment_ids": np.zeros((b, d.max_seq_length), np.int32),
        }
        if task != "q":
            batch.update({
                "visual_feats": np.zeros(
                    (b, e.visual_t + 8, e.visual_hw, e.visual_hw,
                     e.visual_feat_dim), np.float32),
                "visual_mask": np.ones((b, e.visual_seq_length), np.int32),
                "hg_mask": np.ones(
                    (b, d.num_situations, d.num_act + d.num_rel), np.int32),
            })
        params = ShgVqaModel(cfg).init(
            jax.random.PRNGKey(0), batch, deterministic=True)
        return params, connected_param_mask(params, cfg)

    def flat(mask):
        return {
            jax.tree_util.keystr(path): v for path, v in
            jax.tree_util.tree_flatten_with_path(mask)[0]
        }

    # hgqa: the LXRT x_layers + pooler are disconnected (they only feed
    # the unsupervised `logit`); the hgq_encoder's own x/pooler stay live
    params, mask = build("hgqa")
    f = flat(mask)
    assert any("lxrt" in k and "x_tied" in k for k in f), list(f)[:5]
    for k, v in f.items():
        if "lxrt" in k and ("pooler" in k or "x_tied" in k):
            assert not v, k
        else:
            assert v, k

    # vqa: the tree has no decoder subtrees at all; everything connected
    _, mask = build("vqa")
    assert all(jax.tree_util.tree_leaves(mask))

    # q: everything connected
    _, mask = build("q")
    assert all(jax.tree_util.tree_leaves(mask))

    # hgvqa: fusion head supervises pooled output -> x/pooler connected,
    # but the plain logit_fc is now the unsupervised head
    _, mask = build("hgvqa")
    f = flat(mask)
    for k, v in f.items():
        if "logit_fc2" in k:
            assert v, k
        elif "logit_fc" in k:
            assert not v, k
        elif "lxrt" in k and ("pooler" in k or "x_tied" in k):
            assert v, k
        else:
            assert v, k

    # gt_hg: decoders and class heads bypassed
    _, mask = build("hgqa", gt_hg=True)
    f = flat(mask)
    for k, v in f.items():
        if any(s in k for s in ("rel_decoder", "action_decoder",
                                "class_embed", "action_embed")):
            assert not v, k
