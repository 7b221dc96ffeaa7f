"""BertAdam-equivalent optimizer as an optax transformation.

The reference trains every published recipe with its own ``BertAdam``
(``lxrt/optimization.py:52-180``), which differs from stock Adam in ways that
matter for accuracy parity:

- NO bias correction of the first/second moments (:175-178);
- decoupled weight decay ADDED TO THE UPDATE (update += wd * p) rather than
  applied multiplicatively (:151-158);
- the learning-rate schedule is evaluated at ``step / t_total`` with the step
  counter read BEFORE increment, so with warmup_linear the very first update
  has lr == 0 (:160-170 with state['step'] starting at 0);
- schedules: warmup_linear (triangular: x/w up to w, then (x-1)/(w-1) down to
  0), warmup_constant, warmup_cosine (:27-43);
- gradient clipping happens OUTSIDE at global-norm 5.0 (``agqaHGQA.py:391``).

``bert_adam`` reproduces all of that; ``make_optimizer`` composes the
external clip and optional parameter freezing (STAR freezes the backbone,
``star.py:87-88``).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_linear(x: jnp.ndarray, warmup: float) -> jnp.ndarray:
    return jnp.where(
        x < warmup,
        x / warmup,
        jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0),
    )


def warmup_constant(x: jnp.ndarray, warmup: float) -> jnp.ndarray:
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_cosine(x: jnp.ndarray, warmup: float) -> jnp.ndarray:
    return jnp.where(
        x < warmup, x / warmup, 0.5 * (1.0 + jnp.cos(math.pi * x))
    )


SCHEDULES = {
    "warmup_linear": warmup_linear,
    "warmup_constant": warmup_constant,
    "warmup_cosine": warmup_cosine,
}


class BertAdamState(NamedTuple):
    step: jnp.ndarray   # int32 scalar, pre-increment semantics
    m: optax.Updates
    v: optax.Updates


def bert_adam(
    lr: float,
    t_total: int = -1,
    warmup: float = 0.1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    sched_fn: Callable = SCHEDULES[schedule]

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                             v=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        assert params is not None, "bert_adam needs params for weight decay"
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1.0 - b1) * g, state.m, grads)
        v = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv + (1.0 - b2) * g * g, state.v, grads)
        if t_total > 0:
            progress = state.step.astype(jnp.float32) / float(t_total)
            lr_t = lr * sched_fn(progress, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)
        updates = jax.tree_util.tree_map(
            lambda mm, vv, p: -lr_t * (
                mm / (jnp.sqrt(vv) + eps) + weight_decay * p
            ),
            m, v, params,
        )
        return updates, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init, update)


class FlatBertAdamState(NamedTuple):
    step: jnp.ndarray
    m: jnp.ndarray
    v: jnp.ndarray
    trainable: jnp.ndarray   # flat 0/1 mask (all-ones when nothing frozen)


def bert_adam_flat(
    lr: float,
    t_total: int = -1,
    warmup: float = 0.1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    grad_clip: float = 5.0,
    trainable_mask=None,
) -> optax.GradientTransformation:
    """BertAdam over RAVELED parameters: global-norm clip + the full update
    computed on one flat vector.

    Identical math to ``chain(clip_by_global_norm, bert_adam)`` but emitted
    as ~10 XLA ops instead of ~8 per parameter leaf — on backends with
    per-kernel dispatch overhead (remote TPU relays) the optimizer goes from
    thousands of kernel launches to a handful.
    """
    from jax.flatten_util import ravel_pytree

    sched_fn: Callable = SCHEDULES[schedule]
    LANES = 256   # flat state is kept (N/256, 256): a 1-D vector can be
    # fused by XLA into pathologically-tiled shapes (observed: an (N, 4)
    # stack whose (8,128) tiling pads the 4 lanes to 128 — a 32x HBM blowup
    # that OOMs compile); lane-aligned 2-D shapes tile exactly.

    def _pad2d(flat):
        n = flat.shape[0]
        padded = (n + LANES - 1) // LANES * LANES
        return jnp.zeros((padded,), flat.dtype).at[:n].set(flat).reshape(
            -1, LANES)

    def init(params):
        flat, _ = ravel_pytree(params)
        if trainable_mask is not None:
            mask_tree = jax.tree_util.tree_map(
                lambda t, p: jnp.full(jnp.shape(p), float(t), jnp.float32),
                trainable_mask, params,
            )
            trainable, _ = ravel_pytree(mask_tree)
        else:
            trainable = jnp.ones_like(flat)
        return FlatBertAdamState(
            step=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(_pad2d(flat)),
            v=jnp.zeros_like(_pad2d(flat)),
            trainable=_pad2d(trainable),
        )

    def update(grads, state, params=None):
        assert params is not None
        g_flat, unravel = ravel_pytree(grads)
        p_flat, _ = ravel_pytree(params)
        n = g_flat.shape[0]
        g = _pad2d(g_flat)
        p = _pad2d(p_flat)
        # frozen params carry no gradient in the reference (requires_grad
        # False, star.py:87-88) — exclude them from the clip norm exactly
        g = g * state.trainable
        # global-norm clip (agqaHGQA.py:391)
        gnorm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
        scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
        g = g * scale
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * g * g
        if t_total > 0:
            progress = state.step.astype(jnp.float32) / float(t_total)
            lr_t = lr * sched_fn(progress, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)
        upd = -lr_t * (m / (jnp.sqrt(v) + eps) + weight_decay * p)
        upd = upd * state.trainable      # frozen leaves get exact zeros
        return unravel(upd.reshape(-1)[:n]), FlatBertAdamState(
            step=state.step + 1, m=m, v=v, trainable=state.trainable)

    return optax.GradientTransformation(init, update)


class PlainOptState(NamedTuple):
    step: jnp.ndarray     # int32 scalar, 1-based after the first update
    m: optax.Updates      # first moment (adam/adamax); unused zeros otherwise
    v: optax.Updates      # second moment / square_avg / exp_inf


def plain_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    """The reference's non-BertAdam path: ``--optim rms|adam|adamax|sgd``
    binds a stock torch optimizer constructed with ONLY (params, lr)
    (``param.py:11-30``, ``agqaHGQA.py:157``) — no schedule, no weight
    decay, torch-default hyperparameters.  Each rule below reproduces the
    torch 1.10 update exactly (parity-tested against torch.optim in
    tests/test_optimizer.py):

    - adam:   b1=.9 b2=.999 eps=1e-8, bias-corrected moments
    - adamax: exp_inf = max(b2*u, |g|+eps), lr bias-corrected by (1-b1^t)
    - rms:    alpha=.99, eps=1e-8 added OUTSIDE the sqrt
    - sgd:    vanilla p -= lr*g (torch default momentum=0)
    """
    if name == "adam":
        b1, b2, eps = 0.9, 0.999, 1e-8

        def rule(g, m, v, p, t):
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            bc1 = 1.0 - b1 ** t
            bc2 = 1.0 - b2 ** t
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            return -(lr / bc1) * m / denom, m, v

    elif name == "adamax":
        b1, b2, eps = 0.9, 0.999, 1e-8

        def rule(g, m, v, p, t):
            m = b1 * m + (1.0 - b1) * g
            u = jnp.maximum(b2 * v, jnp.abs(g) + eps)
            bc1 = 1.0 - b1 ** t
            return -(lr / bc1) * m / u, m, u

    elif name == "rms":
        alpha, eps = 0.99, 1e-8

        def rule(g, m, v, p, t):
            v = alpha * v + (1.0 - alpha) * g * g
            return -lr * g / (jnp.sqrt(v) + eps), m, v

    elif name == "sgd":
        def rule(g, m, v, p, t):
            return -lr * g, m, v

    else:
        raise ValueError(
            f"unknown optimizer {name!r}; the reference accepts "
            "rms/adam/adamax/sgd or any name containing 'bert' "
            "(param.py:11-30)")

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return PlainOptState(
            step=jnp.zeros((), jnp.int32),
            m=zeros,
            v=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        t = (state.step + 1).astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda g, m, v, p: rule(g, m, v, p, t),
            grads, state.m, state.v,
            params if params is not None else grads)
        treedef = jax.tree_util.tree_structure(grads)
        leaves = treedef.flatten_up_to(out)
        updates = jax.tree_util.tree_unflatten(
            treedef, [u for u, _, _ in leaves])
        m = jax.tree_util.tree_unflatten(treedef, [m for _, m, _ in leaves])
        v = jax.tree_util.tree_unflatten(treedef, [v for _, _, v in leaves])
        return updates, PlainOptState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float,
    t_total: int,
    warmup: float = 0.1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    grad_clip: float = 5.0,
    trainable_mask: Optional[optax.Params] = None,
    flat: bool = False,
    name: str = "bert",
) -> optax.GradientTransformation:
    """clip-by-global-norm 5.0 -> BertAdam (or the stock torch optimizer the
    reference binds for ``--optim rms|adam|adamax|sgd``), optionally masked
    to trainable params (frozen subtrees get zero updates).  The clip is
    applied for EVERY optimizer: the reference clips in the train loop
    unconditionally (agqaHGQA.py:391), not inside BertAdam.

    ``flat=True`` computes the identical update over raveled params in a
    handful of XLA ops (see bert_adam_flat) — a large win on per-op-dispatch
    backends, but this platform's libtpu can horizontally fuse the four flat
    streams into an (N, 4) stack whose lane tiling pads 4->128 (32x HBM,
    compile OOM) at some model sizes, so the per-leaf composition is the
    safe default."""
    if "bert" not in name:
        # non-bert path: constant lr, torch-default hypers, external clip
        inner = plain_optimizer(name, lr)
        flat = False
    else:
        inner = None
    if flat:
        return bert_adam_flat(lr, t_total, warmup, schedule, b1, b2, eps,
                              weight_decay, grad_clip, trainable_mask)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        inner if inner is not None else
        bert_adam(lr, t_total, warmup, schedule, b1, b2, eps, weight_decay),
    )
    if trainable_mask is not None:
        # NOTE: optax.masked would pass masked-out gradients through
        # UNCHANGED (they'd be applied raw) — frozen subtrees need their
        # updates zeroed explicitly.
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_labels=labels,
        )
    return tx
