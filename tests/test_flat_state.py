"""Flat-major train state (train/flat_state.py): numerical equivalence with
the tree path, buffer (batch_stats) immutability, and checkpoint resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgvqa_tpu.configs.config import tiny_test_config


def _items(cfg, n=6, seed=0):
    from tests.test_train_loop import _make_items

    return _make_items(cfg, n=n, seed=seed)


def _make_trainer(cfg, monkeypatch, flat: bool, tmp_path, tag):
    from shgvqa_tpu.train.loop import Trainer

    monkeypatch.setenv("SHGVQA_FLAT_STATE", "1" if flat else "0")
    monkeypatch.setenv("SHGVQA_FLAT_OPT", "1")   # tree path: bert_adam_flat
    out = tmp_path / tag
    out.mkdir()
    return Trainer(cfg.replace(output=str(out)), steps_per_epoch=3)


def test_flat_major_matches_tree_path(tmp_path, monkeypatch):
    """3 epochs of 3 steps: flat-major and tree+bert_adam_flat produce the
    same parameters and losses (identical math, different layout)."""
    from shgvqa_tpu.data.pipeline import Batcher, stack_items

    cfg = tiny_test_config(task="hgqa")
    items = _items(cfg)
    results = {}
    for flat in (True, False):
        tr = _make_trainer(cfg, monkeypatch, flat, tmp_path,
                           f"flat{int(flat)}")
        batcher = Batcher(items, batch_size=2, shuffle=False, seed=0)
        first = next(batcher.epoch(0))
        first = {k: v for k, v in first.items()
                 if k not in ("ques_id", "n_valid")}
        tr.init_params(first)
        assert tr.flat_mode is flat
        losses = []

        def batches(epoch):
            for b in batcher.epoch(epoch):
                yield b

        def fake_eval(t):
            return 0.5, 0.5

        out = tr.train(batches, evaluate=None)
        tr._sync_params_from_flat()
        results[flat] = (jax.device_get(tr.params), out)

    p_flat, p_tree = results[True][0], results[False][0]
    flat_leaves = jax.tree_util.tree_leaves(p_flat)
    tree_leaves = jax.tree_util.tree_leaves(p_tree)
    assert len(flat_leaves) == len(tree_leaves)
    for a, b in zip(flat_leaves, tree_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=2e-5)


def test_flat_state_excludes_aux_collections():
    """Non-'params' collections (BatchNorm stats analogs) stay out of the
    flat vector and are bitwise untouched by a train step."""
    import flax.linen as nn

    from shgvqa_tpu.train.flat_state import (
        build_flat_state,
        flat_to_variables,
        make_flat_train_step,
    )

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True):
            stat = self.variable("stats", "mu", lambda: jnp.ones((4,)))
            w = self.param("w", nn.initializers.ones, (4,))
            return {"y": (batch["x"] - stat.value) * w}

    model = Toy()
    batch = {"x": jnp.arange(8.0).reshape(2, 4)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    assert "stats" in variables
    state, spec = build_flat_state(variables)
    assert spec.n == 4                       # only 'w'
    assert "stats" in spec.aux

    def losses(cfg, outputs, batch):
        loss = jnp.sum(outputs["y"] ** 2)
        return loss, {"total_loss": loss}

    step = make_flat_train_step(
        None, model, spec, lr=1e-2, t_total=-1, compute_losses=losses,
        donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert float(metrics["total_loss"]) > 0
    new_vars = flat_to_variables(new_state, spec)
    np.testing.assert_array_equal(
        np.asarray(new_vars["stats"]["mu"]), np.ones((4,)))
    assert not np.allclose(np.asarray(new_vars["params"]["w"]), 1.0)


def test_tree_path_no_longer_trains_batch_stats(tmp_path, monkeypatch):
    """Regression: the tree train step used to differentiate and update the
    whole variables dict, silently training BatchNorm running stats (torch
    buffers in the reference, pinned by vid_encoder.eval())."""
    import flax.linen as nn

    from shgvqa_tpu.train.loop import Trainer

    cfg = tiny_test_config(task="hgqa")

    class StatModel(nn.Module):
        cfg: object

        @nn.compact
        def __call__(self, batch, deterministic=True,
                     output_attentions=False):
            from shgvqa_tpu.models.shgvqa import ShgVqaModel

            stat = self.variable("batch_stats", "mu",
                                 lambda: jnp.full((3,), 7.0))
            # stats enter the loss so they WOULD get a gradient
            out = ShgVqaModel(self.cfg, name="head")(batch, deterministic)
            out["hg_logit"] = out["hg_logit"] + jnp.sum(stat.value) * 0.0 \
                + jnp.sum(stat.value ** 2) * 1e-3
            return out

    monkeypatch.setenv("SHGVQA_FLAT_STATE", "0")
    tr = Trainer(cfg.replace(output=str(tmp_path)), steps_per_epoch=2,
                 model=StatModel(cfg))
    from shgvqa_tpu.data.pipeline import Batcher

    items = _items(cfg, n=4)
    batcher = Batcher(items, batch_size=2, shuffle=False, seed=0)
    first = next(batcher.epoch(0))
    first = {k: v for k, v in first.items()
             if k not in ("ques_id", "n_valid")}
    tr.init_params(first)
    tr.train(lambda e: batcher.epoch(e), evaluate=None)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(tr.params["batch_stats"]["mu"])),
        np.full((3,), 7.0))


def test_flat_mode_checkpoint_resume(tmp_path, monkeypatch):
    """CURRENT checkpoint from flat mode restores params AND moments."""
    from shgvqa_tpu.data.pipeline import Batcher

    cfg = tiny_test_config(task="hgqa")
    tr = _make_trainer(cfg, monkeypatch, True, tmp_path, "a")
    items = _items(cfg, n=4)
    batcher = Batcher(items, batch_size=2, shuffle=False, seed=0)
    first = next(batcher.epoch(0))
    first = {k: v for k, v in first.items()
             if k not in ("ques_id", "n_valid")}
    tr.init_params(first)
    tr.train(lambda e: batcher.epoch(e), evaluate=None)
    m_before = np.asarray(jax.device_get(tr._flat_state.m))
    step_before = tr.step

    tr2 = _make_trainer(cfg, monkeypatch, True, tmp_path, "b")
    tr2.init_params(first)
    tr2.ckpt = tr.ckpt
    tr2.load("LAST")
    assert tr2.step == step_before
    np.testing.assert_allclose(
        np.asarray(jax.device_get(tr2._flat_state.m)), m_before,
        atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_flat_layout_1d_matches_2d():
    """The "1d" state layout (plain (N,) vector, no lane padding) is a pure
    repacking: 3 steps produce the same parameters as the default
    (N/256, 256) layout up to clip-norm reduction-order rounding.  Uses a
    param count that is NOT a multiple of 256 so the 2-D path actually
    pads."""
    import flax.linen as nn

    from shgvqa_tpu.train.flat_state import (
        build_flat_state,
        flat_to_variables,
        make_flat_train_step,
    )

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True):
            h = nn.Dense(7)(batch["x"])
            return {"y": nn.Dense(5)(h)}

    model = Toy()
    batch = {"x": jnp.arange(12.0).reshape(3, 4)}
    variables = model.init(jax.random.PRNGKey(0), batch)

    def losses(cfg, outputs, batch):
        loss = jnp.sum(outputs["y"] ** 2)
        return loss, {"total_loss": loss}

    finals = {}
    for layout in ("2d", "1d", "1d_aligned"):
        state, spec = build_flat_state(variables, layout=layout)
        assert spec.layout == layout
        assert state.flat.ndim == (2 if layout == "2d" else 1)
        if layout == "1d_aligned":
            # every leaf segment is lane-aligned -> total is a multiple
            assert spec.n % 256 == 0
        else:
            assert spec.n % 256 != 0
        step = make_flat_train_step(
            None, model, spec, lr=1e-2, t_total=-1, compute_losses=losses,
            donate=False)
        for i in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
        finals[layout] = jax.device_get(flat_to_variables(state, spec))

    a = jax.tree_util.tree_leaves(finals["2d"]["params"])
    for other in ("1d", "1d_aligned"):
        b = jax.tree_util.tree_leaves(finals[other]["params"])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)


def test_repack_rejects_cross_order_layouts():
    """m/v repacking between the ravel_pytree layouts and 1d_aligned is
    order-incompatible and must fail loudly, not silently scramble."""
    import flax.linen as nn
    import pytest

    from shgvqa_tpu.train.flat_state import build_flat_state, repack_like

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True):
            return {"y": nn.Dense(5)(batch["x"])}

    variables = Toy().init(jax.random.PRNGKey(0),
                           {"x": jnp.ones((2, 4))})
    s1, spec1 = build_flat_state(variables, layout="1d")
    sa, spec_a = build_flat_state(variables, layout="1d_aligned")
    # same-order conversions still work
    assert repack_like(s1.flat, spec1).shape == s1.flat.shape
    assert repack_like(sa.flat, spec_a).shape == sa.flat.shape
    with pytest.raises(ValueError, match="1d_aligned"):
        repack_like(s1.flat, spec_a)
    with pytest.raises(ValueError, match="1d_aligned"):
        repack_like(sa.flat, spec1)


def test_multi_step_scan_matches_single_steps():
    """make_flat_multi_step(k) == k sequential make_flat_train_step calls,
    bitwise (same per-step keys flow through the scan)."""
    import flax.linen as nn

    from shgvqa_tpu.train.flat_state import (
        build_flat_state,
        flat_to_variables,
        make_flat_multi_step,
        make_flat_train_step,
    )

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True, rngs=None):
            w = self.param("w", nn.initializers.ones, (4, 4))
            h = batch["x"] @ w
            h = nn.Dropout(0.2)(h, deterministic=deterministic)
            return {"y": h}

    model = Toy()
    rng = jax.random.PRNGKey(0)
    batches = [{"x": jax.random.normal(jax.random.fold_in(rng, i), (2, 4))}
               for i in range(3)]
    variables = model.init(rng, batches[0])

    def losses(cfg, outputs, batch):
        loss = jnp.sum(outputs["y"] ** 2)
        return loss, {"total_loss": loss}

    keys = [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(3)]

    state, spec = build_flat_state(variables)
    single = make_flat_train_step(
        None, model, spec, lr=1e-2, t_total=-1, compute_losses=losses,
        donate=False)
    s1 = state
    single_losses = []
    for b, k in zip(batches, keys):
        s1, m = single(s1, b, k)
        single_losses.append(float(m["total_loss"]))

    multi = make_flat_multi_step(
        None, model, spec, lr=1e-2, t_total=-1, compute_losses=losses,
        donate=False)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    s2, metrics = multi(state, stacked, jnp.stack(keys))

    np.testing.assert_array_equal(np.asarray(s1.flat), np.asarray(s2.flat))
    np.testing.assert_array_equal(np.asarray(s1.m), np.asarray(s2.m))
    assert int(s2.step) == 3
    np.testing.assert_allclose(
        np.asarray(metrics["total_loss"]), np.asarray(single_losses),
        rtol=1e-6)


def test_trainer_steps_per_loop_matches_single(tmp_path, monkeypatch):
    """Trainer with --stepsPerLoop 2 (incl. a trailing partial chunk)
    reproduces the steps_per_loop=1 trajectory (same keys/batches; float
    noise only — XLA fuses the scanned body slightly differently, ~1e-5
    relative after 6 BertAdam steps)."""
    from shgvqa_tpu.data.pipeline import Batcher
    from shgvqa_tpu.train.loop import Trainer

    cfg = tiny_test_config(task="hgqa")
    items = _items(cfg)          # 6 items / batch 2 = 3 steps: chunk + tail
    finals = {}
    for k_loop in (1, 2):
        monkeypatch.setenv("SHGVQA_FLAT_STATE", "1")
        out = tmp_path / f"k{k_loop}"
        out.mkdir()
        tr = Trainer(cfg.replace(output=str(out), steps_per_loop=k_loop),
                     steps_per_epoch=3)
        batcher = Batcher(items, batch_size=2, shuffle=False, seed=0)
        first = next(batcher.epoch(0))
        first = {kk: v for kk, v in first.items()
                 if kk not in ("ques_id", "n_valid")}
        tr.init_params(first)
        tr.train(lambda epoch: batcher.epoch(epoch), evaluate=None)
        tr._sync_params_from_flat()
        finals[k_loop] = jax.device_get(tr.params)
        assert tr.step == 3 * cfg.optim.epochs

    a = jax.tree_util.tree_leaves(finals[1]["params"])
    b = jax.tree_util.tree_leaves(finals[2]["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=1e-7)
