"""Learning-parity races beyond the core HGQA loss race (round-3 items).

Three extensions of tests/test_full_model_train_parity.py's harness, each
racing the reference's ACTUAL torch model (transplanted weights, identical
batches, identical loss composition ``agqaHGQA.py:344-378`` /
``star.py:294-344``, BertAdam, grad-clip 5.0):

1. **eval-ACCURACY trajectory** — not just loss: at matched checkpoints both
   frameworks run eval-mode forwards and the hgqa answer prediction
   (``hg_logit.max(1)``, agqaHGQA.py:394) is scored on the train pool
   (memorization must be reached by BOTH) and on a near-distribution val
   pool (noised copies of train items — the memorized answers must
   generalize to the neighborhood on both sides equally).

2. **rand_aug-path race** — every step's inputs flow through the on-device
   RandAugment pipeline with fresh per-step keys.  Our side augments INSIDE
   the jitted train step (the product integration, models/shgvqa.py); the
   reference receives the bit-identical augmented tensors.  pytorchvideo
   (the reference's CPU RandAugment, data_transforms.py:94-115) is not
   installed in this image, and its sampling is stochastically different
   anyway — augmentation parity is distributional by nature, so the claim
   proven here is exactly the checkable one: in-step augmentation is
   sample-identical to offline augmentation, and training THROUGH the
   augmented path tracks the reference trained on the same pixels.

3. **STARModel race** — the reference's STAR assembly (tasks/star_model.py,
   the model ``star.py`` actually trains) against our model at the same tiny
   dims through the same loss.  STARModel differs from AGQAModel only in
   defaults (MAX_STAR_LENGTH, per-dataset query counts, and a shared-init
   decoder layer that torch deep-copies, transformer.py:272-273); the race
   proves the assembly end to end.  The reference's per-choice qa0..qa3
   arrangement is carried by its pipeline but never consumed by the model
   (SURVEY §2.1), so our per-choice head is checked for self-consistent
   learning instead (test_per_choice_head_learns).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/AGQA"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")

from tests.test_full_model_train_parity import (  # noqa: E402,F401
    ACT_CLASSES,
    D,
    MAX_LEN,
    NUM_ACT,
    NUM_ANSWERS,
    NUM_REL,
    REL_CLASSES,
    S,
    T_IN,
    VFEAT,
    VHW,
    VT,
    VOCAB,
    _fresh_ref_model,
    _make_batch,
    _our_batch,
    _our_cfg,
    _ref_forward,
    _ref_loss,
    _transplant,
    ref_setup,
)


def _ref_train_tools(torch, n_steps, lr):
    from src.lxrt.matcher import HungarianMatcher

    matcher = HungarianMatcher(cost_class=1, loss_hg_per_frame=True,
                               clip_len=S)
    empty_w_rel = torch.ones(REL_CLASSES + 1)
    empty_w_rel[0] = 0.1
    empty_w_act = torch.ones(ACT_CLASSES + 1)
    empty_w_act[0] = 0.1
    return matcher, empty_w_rel, empty_w_act


def _our_step_fn(ours, cfg, tx):
    import jax
    import optax

    from shgvqa_tpu.train.step import compute_losses

    def loss_fn(p, b):
        out = ours.apply(p, b, deterministic=True)
        return compute_losses(cfg, out, b)

    @jax.jit
    def step(p, o, b):
        (total, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, b)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, total

    return step


def _transplanted_params(ours, ref_model, batch0):
    import jax
    import jax.numpy as jnp

    params = jax.device_get(ours.init(
        jax.random.PRNGKey(0), _our_batch(batch0), deterministic=True))
    sd = {k: np.array(v.detach().numpy(), copy=True)
          for k, v in ref_model.state_dict().items()}
    params = {"params": _transplant(sd, params["params"])}
    return jax.tree_util.tree_map(jnp.asarray, params)


@pytest.mark.slow
def test_eval_accuracy_trajectory_race(ref_setup):
    """Both frameworks must MEMORIZE the pool (train-pool eval accuracy)
    and generalize to noised copies, with the two accuracy trajectories
    tracking at matched steps."""
    import jax
    import optax  # noqa: F401

    from src.lxrt.optimization import BertAdam

    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer

    torch, mc, am, args, _ = ref_setup
    ref_model = _fresh_ref_model(torch, mc, am)
    cfg = _our_cfg()
    ours = ShgVqaModel(cfg)

    n_steps, lr, ckpt_every = 240, 1e-3, 60
    pool = [_make_batch(np.random.RandomState(900 + i)) for i in range(8)]
    # near-distribution val pool: same (question, answer), noised features
    val_pool = []
    for i, b in enumerate(pool):
        nb = {k: np.array(v, copy=True) for k, v in b.items()}
        nb["feats"] = nb["feats"] + np.random.RandomState(
            7000 + i).randn(*nb["feats"].shape).astype(np.float32) * 0.05
        val_pool.append(nb)
    batches = [pool[i % len(pool)] for i in range(n_steps)]

    params = _transplanted_params(ours, ref_model, batches[0])

    matcher, ew_rel, ew_act = _ref_train_tools(torch, n_steps, lr)
    optim = BertAdam(list(ref_model.parameters()), lr=lr, warmup=0.1,
                     t_total=n_steps)
    tx = make_optimizer(lr=lr, t_total=n_steps, warmup=0.1, flat=False)
    opt_state = tx.init(params)
    step = _our_step_fn(ours, cfg, tx)

    @jax.jit
    def our_predict(p, b):
        out = ours.apply(p, b, deterministic=True)
        return out["hg_logit"].argmax(-1)

    def accuracies(which_pool):
        """(ref_acc, our_acc) over a pool, eval mode both sides."""
        ref_hit = our_hit = n = 0
        ref_model.eval()
        with torch.no_grad():
            for b in which_pool:
                gold = b["target"].argmax(-1)
                ref_pred = _ref_forward(torch, ref_model, b)[3].argmax(-1)
                our_pred = np.asarray(our_predict(params, _our_batch(b)))
                ref_hit += int((ref_pred.numpy() == gold).sum())
                our_hit += int((our_pred == gold).sum())
                n += len(gold)
        ref_model.train()
        return ref_hit / n, our_hit / n, n

    traj = []
    for i, b in enumerate(batches):
        optim.zero_grad()
        out = _ref_forward(torch, ref_model, b)
        total = _ref_loss(torch, matcher, out, b, ew_rel, ew_act)
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 5.0)
        optim.step()
        params, opt_state, _ = step(params, opt_state, _our_batch(b))
        if (i + 1) % ckpt_every == 0:
            tr = accuracies(pool)
            va = accuracies(val_pool)
            traj.append((i + 1, tr, va))

    n_items = traj[-1][1][2]
    # 1) both sides memorize: final train-pool accuracy is high AND equal
    #    within 2 items
    ref_fin, our_fin, _ = traj[-1][1]
    assert ref_fin >= 0.8, traj
    assert our_fin >= 0.8, traj
    assert abs(ref_fin - our_fin) * n_items <= 2, traj
    # 2) the trajectories track: train-pool accuracy within 4 items at
    #    every checkpoint (accuracy is a discrete 16-item statistic; exact
    #    trajectories diverge chaotically after O(10) f32 steps)
    for step_i, (r, o, n), _v in traj:
        assert abs(r - o) * n <= 4, (step_i, r, o, traj)
    # 3) the memorized answers generalize to the noised neighborhood on
    #    both sides equally (within 3 items)
    ref_v, our_v, n_v = traj[-1][2]
    assert ref_v >= 0.6 and our_v >= 0.6, traj
    assert abs(ref_v - our_v) * n_v <= 3, traj


@pytest.mark.slow
def test_rand_aug_path_race(ref_setup):
    """Training THROUGH the on-device RandAugment pipeline: our side
    augments inside the jitted step from uint8 pixels; the reference
    receives bit-identical augmented features.  Checks (a) in-step == offline
    augmentation at step 0 and (b) loss trajectories track."""
    import jax
    import jax.numpy as jnp
    import optax

    from src.lxrt.optimization import BertAdam

    from shgvqa_tpu.data.transforms import rand_augment_batch
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses

    torch, mc, am, args, _ = ref_setup
    ref_model = _fresh_ref_model(torch, mc, am)
    cfg = _our_cfg()
    ours = ShgVqaModel(cfg)

    n_steps, lr = 120, 1e-3
    hw = 14                                   # tiny pixel plane
    rng = np.random.RandomState(41)
    pool = [_make_batch(np.random.RandomState(800 + i)) for i in range(4)]
    frames_pool = [rng.randint(0, 256, (2, T_IN, hw, hw, 3), np.uint8)
                   for _ in range(4)]
    # fixed projection: augmented pixels -> the backbone-feature layout the
    # tiny model consumes, (B, VFEAT, T_IN, VHW, VHW)
    proj = (rng.randn(hw * hw * 3, VFEAT * VHW * VHW) * 0.05).astype(
        np.float32)
    proj_j = jnp.asarray(proj)

    def feats_from_frames(frames_u8, keys):
        x = frames_u8.astype(jnp.float32) / 255.0
        x = rand_augment_batch(x, keys, eq_stride=1)
        b, t = x.shape[0], x.shape[1]
        f = x.reshape(b, t, -1) @ proj_j                # (B, T, F*H*W)
        f = f.reshape(b, t, VFEAT, VHW, VHW)
        return f.transpose(0, 2, 1, 3, 4)               # (B, F, T, H, W)

    params = _transplanted_params(ours, ref_model, pool[0])

    def loss_fn(p, frames, keys, b):
        feats = feats_from_frames(frames, keys)
        ob = dict(b)
        ob["visual_feats"] = feats.transpose(0, 2, 3, 4, 1)
        out = ours.apply(p, ob, deterministic=True)
        return compute_losses(cfg, out, b)

    tx = make_optimizer(lr=lr, t_total=n_steps, warmup=0.1, flat=False)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, frames, keys, b):
        (total, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, frames, keys, b)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, total

    offline_feats = jax.jit(feats_from_frames)

    # (a) integration identity at step 0: the loss computed with the
    # augmentation INSIDE the train-step jit equals the loss on the same
    # batch with the augmented features precomputed offline
    keys0 = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(5), 0), 2)
    f_off = np.asarray(offline_feats(jnp.asarray(frames_pool[0]), keys0))
    ob0 = {k: v for k, v in _our_batch(pool[0]).items()
           if k != "visual_feats"}
    l_injit = float(jax.jit(
        lambda p, f, k, b: loss_fn(p, f, k, b)[0])(
            params, jnp.asarray(frames_pool[0]), keys0, ob0))
    ob_full = dict(ob0)
    ob_full["visual_feats"] = f_off.transpose(0, 2, 3, 4, 1)
    l_off = float(jax.jit(
        lambda p, b: compute_losses(
            cfg, ours.apply(p, b, deterministic=True), b)[0])(
                params, ob_full))
    np.testing.assert_allclose(l_injit, l_off, rtol=1e-5, atol=1e-5)

    matcher, ew_rel, ew_act = _ref_train_tools(torch, n_steps, lr)
    optim = BertAdam(list(ref_model.parameters()), lr=lr, warmup=0.1,
                     t_total=n_steps)

    ref_losses, our_losses = [], []
    for i in range(n_steps):
        b = pool[i % 4]
        frames = frames_pool[i % 4]
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(5), i), 2)
        feats_np = np.asarray(offline_feats(jnp.asarray(frames), keys))
        # reference trains on the identical augmented features
        rb = dict(b)
        rb["feats"] = feats_np
        optim.zero_grad()
        out = _ref_forward(torch, ref_model, rb)
        total = _ref_loss(torch, matcher, out, rb, ew_rel, ew_act)
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 5.0)
        optim.step()
        ref_losses.append(float(total.detach()))

        ob = {k: v for k, v in _our_batch(b).items()
              if k != "visual_feats"}
        params, opt_state, t = step(params, opt_state,
                                    jnp.asarray(frames), keys, ob)
        our_losses.append(float(t))

    ref = np.asarray(ref_losses)
    our = np.asarray(our_losses)
    # early steps: exact-trajectory regime
    np.testing.assert_allclose(our[:6], ref[:6], rtol=2e-2, atol=2e-2)
    # both learn through the augmented path
    init = ref[:5].mean()
    assert ref[-20:].mean() < 0.7 * init, (ref[-20:].mean(), init)
    assert our[-20:].mean() < 0.7 * init, (our[-20:].mean(), init)
    # trajectories track in 30-step windows
    for lo in range(0, n_steps, 30):
        rw, ow = ref[lo:lo + 30].mean(), our[lo:lo + 30].mean()
        assert abs(ow - rw) / rw < 0.25, (lo, rw, ow)


@pytest.fixture(scope="module")
def star_ref_model(ref_setup):
    """The reference STARModel at the same tiny dims (the model star.py
    trains; structurally AGQAModel with STAR defaults)."""
    torch, mc, am, args, _ = ref_setup
    # upstream bug: star_model.py:10 imports BERT from modeling_capsbert,
    # which defines no such symbol — the reference's STARModel is
    # unimportable as shipped (the star.py driver crashes at import).
    # Inject a placeholder (never used by STARModel's body) to unblock.
    if not hasattr(mc, "BERT"):
        mc.BERT = None
    import src.tasks.star_model as sm

    class StubBackbone(torch.nn.Module):
        def __init__(self, name):
            super().__init__()

        def encode(self, x):
            return x

    real, sm.VideoBackbone = sm.VideoBackbone, StubBackbone
    try:
        torch.manual_seed(0)
        model = sm.STARModel(
            num_answers=NUM_ANSWERS, num_queries=S * NUM_REL,
            num_classes=REL_CLASSES, num_actions=ACT_CLASSES,
            act_queries=S * NUM_ACT)
    finally:
        sm.VideoBackbone = real
    torch.manual_seed(33)
    model.lxrt_encoder.model.bert.encoder.visn_fc.conv[1] = torch.nn.Conv3d(
        VFEAT, D, (5, 3, 3))
    model.lxrt_encoder.model.bert.encoder.visn_fc.conv[4] = torch.nn.Conv3d(
        D, D, (5, 3, 3))
    pe = model.lxrt_encoder.model.bert.encoder.visn_fc.position_encoding
    pe.pe = torch.nn.Embedding(VT * VHW * VHW + 1, D)
    model.relation_query_embed.dropout.p = 0.0
    model.train()
    return model


@pytest.mark.slow
def test_star_model_race(ref_setup, star_ref_model):
    """STAR assembly race: reference STARModel vs our model, identical
    transplanted init, identical batches, the star.py loss composition
    (== agqaHGQA's: bce(hg_logit)*n + Hungarian rel/act CE)."""
    import jax  # noqa: F401
    import optax  # noqa: F401

    from src.lxrt.optimization import BertAdam

    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer

    torch, mc, am, args, _ = ref_setup
    ref_model = star_ref_model
    cfg = _our_cfg()
    ours = ShgVqaModel(cfg)

    n_steps, lr = 120, 1e-3
    pool = [_make_batch(np.random.RandomState(600 + i)) for i in range(6)]
    batches = [pool[i % len(pool)] for i in range(n_steps)]

    params = _transplanted_params(ours, ref_model, batches[0])

    # forward parity at step 0 (eval mode)
    ref_model.eval()
    with torch.no_grad():
        ref_out0 = _ref_forward(torch, ref_model, batches[0])
    out0 = ours.apply(params, _our_batch(batches[0]), deterministic=True)
    np.testing.assert_allclose(np.asarray(out0["hg_logit"]),
                               ref_out0[3].numpy(), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out0["rel_preds"]),
                               ref_out0[1].numpy(), rtol=5e-4, atol=5e-4)
    ref_model.train()

    matcher, ew_rel, ew_act = _ref_train_tools(torch, n_steps, lr)
    optim = BertAdam(list(ref_model.parameters()), lr=lr, warmup=0.1,
                     t_total=n_steps)
    tx = make_optimizer(lr=lr, t_total=n_steps, warmup=0.1, flat=False)
    opt_state = tx.init(params)
    step = _our_step_fn(ours, cfg, tx)

    ref_losses, our_losses = [], []
    for b in batches:
        optim.zero_grad()
        out = _ref_forward(torch, ref_model, b)
        total = _ref_loss(torch, matcher, out, b, ew_rel, ew_act)
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 5.0)
        optim.step()
        ref_losses.append(float(total.detach()))
        params, opt_state, t = step(params, opt_state, _our_batch(b))
        our_losses.append(float(t))

    ref = np.asarray(ref_losses)
    our = np.asarray(our_losses)
    np.testing.assert_allclose(our[:6], ref[:6], rtol=2e-2, atol=2e-2)
    init = ref[:5].mean()
    assert ref[-20:].mean() < 0.7 * init
    assert our[-20:].mean() < 0.7 * init
    for lo in range(0, n_steps, 30):
        rw, ow = ref[lo:lo + 30].mean(), our[lo:lo + 30].mean()
        assert abs(ow - rw) / rw < 0.25, (lo, rw, ow)


@pytest.mark.slow
def test_per_choice_head_learns():
    """STAR per-choice QA (--qaArrangeType add_sep): the reference pipeline
    CARRIES qa0..qa3 but its model never consumes them (SURVEY §2.1), so
    there is no reference trajectory to race; the contract is
    self-consistency — the per-choice head trains to pick the right choice
    on a memorizable synthetic set."""
    import jax
    import jax.numpy as jnp
    import optax

    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.models.shgvqa import ShgVqaModel
    from shgvqa_tpu.train.optimizer import make_optimizer
    from shgvqa_tpu.train.step import compute_losses

    import dataclasses

    cfg = tiny_test_config(task="hgqa")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, qa_arrange_type="add_sep"),
        compute_dtype="float32")
    ours = ShgVqaModel(cfg)
    d, e = cfg.data, cfg.encoder

    rng = np.random.RandomState(3)
    b, nch, lt = 4, 4, d.max_seq_length
    batch = {
        "choice_input_ids": rng.randint(
            1, e.vocab_size, (b, nch, lt)).astype(np.int32),
        "choice_input_mask": np.ones((b, nch, lt), np.int32),
        "choice_segment_ids": np.zeros((b, nch, lt), np.int32),
        "input_ids": rng.randint(1, e.vocab_size, (b, lt)).astype(np.int32),
        "input_mask": np.ones((b, lt), np.int32),
        "segment_ids": np.zeros((b, lt), np.int32),
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
    }
    gold = rng.randint(nch, size=b)
    batch["target"] = np.eye(nch, dtype=np.float32)[gold]

    params = ours.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out0 = ours.apply(params, batch, deterministic=True)
    assert out0["hg_logit"].shape == (b, nch)

    tx = make_optimizer(lr=2e-3, t_total=150, warmup=0.1, flat=False)
    opt_state = tx.init(params)

    def loss_fn(p):
        out = ours.apply(p, batch, deterministic=True)
        return compute_losses(cfg, out, batch)

    @jax.jit
    def step(p, o):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, metrics["hgqa_loss"]

    first = last = None
    for i in range(150):
        params, opt_state, t = step(params, opt_state)
        if i == 0:
            first = float(t)
        last = float(t)
    # the CHOICE-head loss component collapses (the Hungarian rel/act terms
    # share the total and learn on their own schedule)
    assert last < 0.25 * first, (first, last)
    pred = np.asarray(ours.apply(
        params, batch, deterministic=True)["hg_logit"]).argmax(-1)
    assert (pred == gold).mean() == 1.0, (pred, gold)
