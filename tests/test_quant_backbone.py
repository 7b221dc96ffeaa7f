"""int8 quantized frozen-backbone path (models/backbone.py SlowR50.quant).

The trunk is HBM-bandwidth-bound in bf16 (PERF.md par. 2/6); the int8 path
halves the streamed bytes and doubles the MXU rate (0.61x bottleneck-chain
time on-chip, tools/proto_int8_backbone.py).  These tests pin the scheme's
correctness contract on CPU:
  - any apply with mutable=['quant_stats'] (init included) is a calibration
    pass: full-precision forward + running max-abs scale recording
  - the quantized forward tracks the full-precision trunk
  - param/batch_stats trees are IDENTICAL across the flag (checkpoints and
    torch converters work unchanged)
  - quantize-then-maxpool == maxpool-then-quantize (stem requant placement)
  - config/CLI guards: frozen-trunk requirement, slow_r50-only, flag flow
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shgvqa_tpu.configs.config import tiny_test_config
from shgvqa_tpu.models.backbone import (
    SlowR50,
    _max_pool_i8,
    make_backbone,
    quant_sym,
    quant_weight,
)

TOY = dict(stem_width=8, mids=(8, 8, 8, 8), outs=(16, 16, 16, 16),
           depths=(1, 1, 1, 1))


def _frames(bsz=2, t=4, hw=32, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(bsz, t, hw, hw, 3), jnp.float32)


def test_quant_tracks_plain_toy():
    mq = SlowR50(dtype=jnp.float32, quant=True, **TOY)
    mf = SlowR50(dtype=jnp.float32, quant=False, **TOY)
    x = _frames()
    v = mq.init(jax.random.PRNGKey(0), x)     # init IS the calibration
    assert set(v) == {"params", "batch_stats", "quant_stats"}
    ref = mf.apply({k: v[k] for k in ("params", "batch_stats")}, x)
    got = mq.apply(v, x)
    scale = float(jnp.max(jnp.abs(ref)))
    err = np.abs(np.asarray(got - ref)) / scale
    # toy widths amplify relative quant noise; flagship widths average it
    assert err.max() < 0.1 and err.mean() < 0.02


def test_quant_param_tree_checkpoint_compatible():
    """Same rng => bit-identical params and batch_stats across the flag
    (the int8 path declares kernels/BNs at the exact nn.Conv paths)."""
    mq = SlowR50(dtype=jnp.float32, quant=True, **TOY)
    mf = SlowR50(dtype=jnp.float32, quant=False, **TOY)
    x = _frames()
    vq = mq.init(jax.random.PRNGKey(7), x)
    vf = mf.init(jax.random.PRNGKey(7), x)
    for col in ("params", "batch_stats"):
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               vq[col], vf[col])


def test_calibration_accumulates_running_max():
    mq = SlowR50(dtype=jnp.float32, quant=True, **TOY)
    x = _frames()
    v = mq.init(jax.random.PRNGKey(0), x)
    _, upd = mq.apply(v, x * 3.0, mutable=["quant_stats"])
    leaves = zip(jax.tree_util.tree_leaves(v["quant_stats"]),
                 jax.tree_util.tree_leaves(upd["quant_stats"]))
    assert all(float(b) >= float(a) for a, b in leaves)
    assert all(float(b) > 0 for _, b in leaves)


def test_quant_then_maxpool_commutes():
    x = jnp.asarray(np.random.RandomState(1).rand(2, 3, 16, 16, 8) * 4,
                    jnp.float32)
    s = float(x.max()) / 127.0
    a = _max_pool_i8(quant_sym(x, s))
    from flax import linen as nn

    b = quant_sym(nn.max_pool(x, window_shape=(1, 3, 3), strides=(1, 2, 2),
                              padding=((0, 0), (1, 1), (1, 1))), s)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quant_weight_roundtrip_bound():
    w = jnp.asarray(np.random.RandomState(2).randn(1, 3, 3, 8, 16),
                    jnp.float32)
    wq, sw = quant_weight(w)
    assert wq.dtype == jnp.int8
    err = np.abs(np.asarray(w) - np.asarray(wq) * np.asarray(sw))
    # round-to-nearest: at most half a step per output channel
    assert (err <= np.asarray(sw) / 2 + 1e-7).all()


@pytest.mark.slow
def test_video_model_quant_forward_and_chunks():
    """Full frames->answer model with --quantBackbone: logits track the
    bf16 model, and the micro-chunked trunk matches unchunked."""
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    cfg = tiny_test_config(task="hgqa", freeze_backbone=True,
                           quant_backbone="int8", compute_dtype="float32")
    rng = np.random.RandomState(0)
    d, e = cfg.data, cfg.encoder
    bsz = 2
    batch = {
        "input_ids": rng.randint(
            1, e.vocab_size, (bsz, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((bsz, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((bsz, d.max_seq_length), np.int32),
        "frames": rng.randint(0, 255, (bsz, e.visual_t + 8, 32, 32, 3)
                              ).astype(np.uint8),
    }
    model = VideoShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out_q = model.apply(params, batch, deterministic=True)
    assert np.isfinite(np.asarray(out_q["logit"])).all()

    plain = VideoShgVqaModel(cfg.replace(quant_backbone=""))
    out_f = plain.apply({k: params[k] for k in ("params", "batch_stats")},
                        batch, deterministic=True)
    a = np.asarray(out_q["logit"], np.float64).ravel()
    b = np.asarray(out_f["logit"], np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr

    # chunked vs unchunked under quant: XLA tiles convs differently at
    # batch 1 vs 2, and round() amplifies those float-ulp differences into
    # whole int8 steps — compare at quant-step granularity, not float tol
    chunked = VideoShgVqaModel(cfg.replace(backbone_chunks=2))
    out_c = chunked.apply(params, batch, deterministic=True)
    q = np.asarray(out_q["logit"], np.float64)
    c = np.asarray(out_c["logit"], np.float64)
    assert np.corrcoef(q.ravel(), c.ravel())[0, 1] > 0.999
    assert np.abs(q - c).max() < 0.05 * max(np.abs(q).max(), 1e-6)


@pytest.mark.slow
def test_quant_eval_preserves_trained_accuracy():
    """The deployment story: train in full precision, serve with the int8
    trunk.  A model that memorized its train pool must keep (almost) all
    of its answer accuracy when evaluated through the quantized trunk."""
    import optax

    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    cfg = tiny_test_config(task="hgqa", freeze_backbone=True,
                           compute_dtype="float32")
    rng = np.random.RandomState(0)
    d, e = cfg.data, cfg.encoder
    n = 8
    batch = {
        "input_ids": rng.randint(
            1, e.vocab_size, (n, d.max_seq_length)).astype(np.int32),
        "input_mask": np.ones((n, d.max_seq_length), np.int32),
        "segment_ids": np.zeros((n, d.max_seq_length), np.int32),
        "frames": rng.randint(0, 255, (n, e.visual_t + 8, 32, 32, 3)
                              ).astype(np.uint8),
    }
    labels = rng.randint(0, cfg.num_answers, (n,))
    model = VideoShgVqaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    tx = optax.adam(3e-3)
    opt = tx.init(params["params"])

    def loss_fn(p, aux, b):
        out = model.apply({"params": p, **aux}, b, deterministic=True)
        logp = jax.nn.log_softmax(out["logit"], axis=-1)
        return -jnp.mean(logp[jnp.arange(n), labels])

    @jax.jit
    def step(p, o, aux, b):
        l, g = jax.value_and_grad(loss_fn)(p, aux, b)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    p = params["params"]
    aux = {k: v for k, v in params.items() if k != "params"}
    for _ in range(120):
        p, opt, loss = step(p, opt, aux, batch)
    trained = {"params": p, **aux}

    def acc(m, variables):
        out = m.apply(variables, batch, deterministic=True)
        return float(np.mean(np.argmax(
            np.asarray(out["logit"]), -1) == labels))

    plain_acc = acc(model, trained)
    assert plain_acc == 1.0, (plain_acc, float(loss))

    qmodel = VideoShgVqaModel(cfg.replace(quant_backbone="int8"))
    # post-training calibration on the eval distribution
    _, upd = qmodel.apply(trained, batch, deterministic=True,
                          mutable=["quant_stats"])
    quant_acc = acc(qmodel, {**trained,
                             "quant_stats": upd["quant_stats"]})
    assert quant_acc >= plain_acc - 0.125, (quant_acc, plain_acc)


def test_quant_requires_frozen_backbone():
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    cfg = tiny_test_config(task="hgqa", freeze_backbone=False,
                           quant_backbone="int8")
    batch = {"input_ids": np.ones((1, cfg.data.max_seq_length), np.int32),
             "input_mask": np.ones((1, cfg.data.max_seq_length), np.int32),
             "segment_ids": np.zeros((1, cfg.data.max_seq_length), np.int32),
             "frames": np.zeros((1, cfg.encoder.visual_t + 8, 32, 32, 3),
                                np.uint8)}
    with pytest.raises(ValueError, match="frozen"):
        VideoShgVqaModel(cfg).init(jax.random.PRNGKey(0), batch,
                                   deterministic=True)


def test_make_backbone_quant_guards():
    with pytest.raises(NotImplementedError, match="slow_r50"):
        make_backbone("resnext101", quant="int8")
    with pytest.raises(ValueError, match="int8"):
        make_backbone("slow_r50", quant="int4")
    m = make_backbone("slow_r50", quant="int8")
    assert m.quant


def test_cli_quant_flag_flow():
    from shgvqa_tpu.configs.cli import parse_reference_flags

    argv = "--train train --taskHGQA --noCaps --quantBackbone int8".split()
    cfg = parse_reference_flags(argv, dataset="agqa")
    assert cfg.quant_backbone == "int8"
    assert cfg.freeze_backbone          # implied by the flag on agqa
    cfg2 = parse_reference_flags(
        "--train train --taskHGQA --noCaps".split(), dataset="agqa")
    assert cfg2.quant_backbone == "" and not cfg2.freeze_backbone
