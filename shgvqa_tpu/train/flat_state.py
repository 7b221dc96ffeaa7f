"""Flat-major train state: the training state IS one lane-aligned vector.

Round-2 ladder profiling (tools/bench_ladder.py, b32 flagship on-chip) split
the 377 ms train step into fwd 106 + bwd 134 + optimizer/apply ~140 ms.  The
optimizer tail is pure per-leaf dispatch: even with the "flat" BertAdam
(train/optimizer.py:bert_adam_flat) every step pays ravel(grads) +
unravel(updates) + ~200 per-leaf apply adds — ~500 thunks on a relay that
dispatches each thunk individually (~0.27 ms, ROUND1_NOTES).

Flat-major inverts the representation (tools/proto_flat_state.py A/B):

- the canonical state is ``flat``: the ravel of the model's ``params``
  collection, padded to (N/256, 256) f32 — 1-D vectors can be horizontally
  fused by libtpu into pathologically tiled stacks (see bert_adam_flat);
- the parameter TREE is materialized by ``unravel`` INSIDE the jit (the
  ~200 slices feed the forward directly, and the backward of ravel is one
  concat), so gradients arrive already flat;
- BertAdam + global-norm clip + the parameter update are ~12 fused ops over
  3 big arrays, with the whole state donated in place;
- non-"params" collections (BatchNorm running stats) are NOT part of the
  state and receive no gradient or update — matching the reference, where
  they are torch buffers held fixed by ``vid_encoder.eval()``
  (``agqaHGQA.py:263``).  (The tree path had been silently training them —
  fixed in train/loop.py the same way.)

Measured (b32/b64 flagship, frozen backbone, fused attention):
tree+flat-optimizer 377 ms -> flat-major 295 ms (b32); b64 489 ms =
131 clips/s/chip vs 94.3 at the end of round 1 (+39%), and the round-1
"b64 is 1.85 s" pathology disappears (it was optimizer tree churn).

Semantics match ``bert_adam_flat`` exactly: no bias correction, decoupled
weight decay, pre-increment schedule, frozen leaves excluded from the clip
norm (``lxrt/optimization.py:52-180``, ``star.py:87-88``);
tests/test_flat_state.py locks step-for-step equality with the tree path.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shgvqa_tpu.train.optimizer import SCHEDULES

LANES = 256

# checkpoint-persisted layout identifiers (int-coded for orbax): restores
# compare the stored layout to the live spec EXPLICITLY; array-length
# inference survives only as the fallback for pre-round-5 checkpoints
LAYOUT_CODES = {"1d": 0, "2d": 1, "1d_aligned": 2}
_CODE_LAYOUTS = {v: k for k, v in LAYOUT_CODES.items()}


def layout_from_code(code) -> Optional[str]:
    """Inverse of LAYOUT_CODES; None for absent/unknown (old checkpoints)."""
    if code is None:
        return None
    return _CODE_LAYOUTS.get(int(code))


class FlatTrainState(NamedTuple):
    flat: jnp.ndarray        # (R, LANES) f32 — padded ravel of params
    m: jnp.ndarray           # first moment, same shape
    v: jnp.ndarray           # second moment
    trainable: jnp.ndarray   # 0/1 mask, same shape
    step: jnp.ndarray        # () int32, pre-increment semantics


class FlatSpec(NamedTuple):
    """Static companion of FlatTrainState: how to rebuild the tree."""
    unravel: Callable[[jnp.ndarray], Any]
    n: int                   # true (unpadded) element count
    aux: Dict[str, Any]      # non-"params" collections (e.g. batch_stats)
    masked: bool = True      # False = mask is all-ones, skip its multiplies
    layout: str = "2d"       # "2d" = (N/256, 256) lane-aligned; "1d" = (N,)


def _pad2d(flat: jnp.ndarray) -> jnp.ndarray:
    n = flat.shape[0]
    padded = (n + LANES - 1) // LANES * LANES
    return jnp.zeros((padded,), flat.dtype).at[:n].set(flat).reshape(
        -1, LANES)


def _aligned_ravel(params):
    """Lane-aligned ravel: every leaf starts at a LANES-aligned offset.

    ravel_pytree packs leaves back to back, so the backward of the unravel
    (the per-step grad-flatten concat, ~16 ms of the b64 train profile) has
    to stitch ~200 slices at arbitrary lane phases.  Aligning each leaf's
    segment to the 256-lane boundary turns every piece of that concat into
    a whole-lane copy.  The gaps are inert: their grads are exactly zero
    (unravel never reads them), so BertAdam's update there is
    -lr*(0/(sqrt(0)+eps) + wd*0) = 0 forever.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [jnp.shape(l) for l in leaves]
    sizes = [int(np.prod(s)) if len(s) else 1 for s in shapes]
    dtypes = [jnp.asarray(l).dtype for l in leaves]
    offsets = []
    off = 0
    for sz in sizes:
        offsets.append(off)
        off += -(-sz // LANES) * LANES
    total = off

    def ravel_fn(tree):
        ls = jax.tree_util.tree_leaves(tree)
        buf = jnp.zeros((total,), jnp.float32)
        for o, sz, leaf in zip(offsets, sizes, ls):
            buf = buf.at[o:o + sz].set(
                jnp.asarray(leaf, jnp.float32).reshape(-1))
        return buf

    def unravel_fn(flat):
        ls = [flat[o:o + sz].reshape(sh).astype(dt)
              for o, sz, sh, dt in zip(offsets, sizes, shapes, dtypes)]
        return jax.tree_util.tree_unflatten(treedef, ls)

    return ravel_fn, unravel_fn, total


def build_flat_state(variables: Dict[str, Any],
                     trainable_mask: Optional[Any] = None,
                     layout: str = "2d",
                     ) -> Tuple[FlatTrainState, FlatSpec]:
    """variables: the full model.init output ({'params': ..., maybe
    'batch_stats': ...}).  Only the 'params' collection enters the flat
    vector; the rest rides along as fixed aux inputs.

    layout: "2d" keeps the state (N/256, 256) lane-aligned (safe against the
    libtpu horizontal-fusion tiling pathology that hits MANY small 1-D
    arrays); "1d" keeps it a plain (N,) vector, which removes the two
    full-state tiled<->linear reshape copies (~4 ms each at flagship size,
    b64 profile) the 2-D form pays around unravel/re-ravel each step — safe
    here because the state is a SINGLE large array, never horizontally
    fused."""
    from jax.flatten_util import ravel_pytree

    params = variables["params"]
    aux = {k: v for k, v in variables.items() if k != "params"}
    if layout == "1d_aligned":
        ravel, unravel, _total = _aligned_ravel(params)
        flat = jax.jit(ravel)(params)
    else:
        flat, unravel = ravel_pytree(params)
        ravel = None
        flat = flat.astype(jnp.float32)
    if trainable_mask is not None:
        mask_p = trainable_mask["params"] if (
            isinstance(trainable_mask, dict)
            and "params" in trainable_mask) else trainable_mask
        mask_tree = jax.tree_util.tree_map(
            lambda t, p: jnp.full(jnp.shape(p), float(t), jnp.float32),
            mask_p, params)
        if layout == "1d_aligned":
            trainable = jax.jit(ravel)(mask_tree)
        else:
            trainable, _ = ravel_pytree(mask_tree)
    else:
        trainable = jnp.ones_like(flat)
    pack = _pad2d if layout == "2d" else (lambda x: x)
    state = FlatTrainState(
        flat=pack(flat),
        m=jnp.zeros_like(pack(flat)),
        v=jnp.zeros_like(pack(flat)),
        trainable=pack(trainable),
        step=jnp.zeros((), jnp.int32),
    )
    return state, FlatSpec(unravel=unravel, n=int(flat.shape[0]), aux=aux,
                           masked=trainable_mask is not None, layout=layout)


def shard_flat_state(state: FlatTrainState, mesh) -> FlatTrainState:
    """Place the flat state REPLICATED over a data-parallel mesh.

    Under SPMD data parallelism the state is identical on every chip (the
    reference's DataParallel replicate, ``agqaHGQA.py:124-129``); feeding the
    jitted step replicated state + a batch sharded over the ``data`` axis
    makes XLA emit the per-step gradient all-reduce over ICI automatically —
    the flat-major optimizer path (one fused update over 3 big arrays) is
    unchanged, so dp scale-out keeps the single-chip optimizer wins."""
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    return FlatTrainState(*(jax.device_put(x, rep) for x in state))


def repack_like(arr: jnp.ndarray, spec: FlatSpec,
                layout: Optional[str] = None) -> jnp.ndarray:
    """Repack a stored flat-state array into spec.layout — lets a checkpoint
    written under one layout resume under the other.  "2d" and "1d" share
    the ravel_pytree element order (tail padding only) and convert freely;
    "1d_aligned" has per-leaf gap padding, so only a same-layout restore is
    accepted (the orders differ element-wise).

    ``layout`` is the layout the checkpoint RECORDS it was written under
    (state_dict's layout_code); when given, cross-family repacks are
    rejected by name — array-length inference (which a coincidental size
    match could fool) is only the fallback for old checkpoints that carry
    no layout field."""
    flat = jnp.asarray(arr).reshape(-1)
    if layout is not None and (
            (layout == "1d_aligned") != (spec.layout == "1d_aligned")):
        raise ValueError(
            f"flat checkpoint records layout {layout!r}; it cannot be "
            f"repacked into {spec.layout!r} (different element order) — "
            "restore with SHGVQA_FLAT_LAYOUT matching the checkpoint, or "
            "drop the optimizer moments")
    if spec.layout == "1d_aligned":
        if flat.shape[0] != spec.n:
            raise ValueError(
                "flat checkpoint was written under the ravel_pytree layout "
                "or a different model size; it cannot be repacked into "
                "1d_aligned (different element order) — restore with "
                "SHGVQA_FLAT_LAYOUT matching the checkpoint, or drop the "
                "optimizer moments")
        return flat
    tail_pad = -(-spec.n // LANES) * LANES
    if layout is None and flat.shape[0] not in (spec.n, tail_pad):
        raise ValueError(
            "flat checkpoint appears to use the 1d_aligned layout; it "
            "cannot be repacked into the ravel_pytree layouts — restore "
            "with SHGVQA_FLAT_LAYOUT=1d_aligned, or drop the moments")
    flat = flat[:spec.n]
    return _pad2d(flat) if spec.layout == "2d" else flat


def flat_to_variables(state: FlatTrainState, spec: FlatSpec) -> Dict[str, Any]:
    """Materialize the model variables dict from the flat state (host side:
    used for eval steps, checkpoints, and weight-surgery paths)."""
    params = jax.jit(
        lambda f: spec.unravel(f.reshape(-1)[:spec.n]))(state.flat)
    return {"params": params, **spec.aux}


def _flat_step_body(cfg, model, spec: FlatSpec, *, lr: float,
                    t_total: int, warmup: float = 0.1,
                    schedule: str = "warmup_linear", b1: float = 0.9,
                    b2: float = 0.999, eps: float = 1e-6,
                    weight_decay: float = 0.01, grad_clip: float = 5.0,
                    compute_losses=None):
    """Unjitted train_step(state, batch, rng) -> (state, metrics) — shared
    by the single-step jit and the multi-step scan."""
    if compute_losses is None:
        from shgvqa_tpu.train.step import compute_losses as _cl
        compute_losses = _cl
    sched_fn = SCHEDULES[schedule]
    unravel, n = spec.unravel, spec.n
    aux = spec.aux
    masked = spec.masked

    def train_step(state: FlatTrainState, batch, rng):
        def loss_flat(flat2d):
            variables = {"params": unravel(flat2d.reshape(-1)[:n]), **aux}
            r_drop, r_aug = jax.random.split(rng)
            outputs = model.apply(variables, batch, deterministic=False,
                                  rngs={"dropout": r_drop, "augment": r_aug})
            return compute_losses(cfg, outputs, batch)

        (_, metrics), g = jax.value_and_grad(
            loss_flat, has_aux=True)(state.flat)
        if masked:
            g = g * state.trainable
        gnorm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
        g = g * jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * g * g
        if t_total > 0:
            progress = state.step.astype(jnp.float32) / float(t_total)
            lr_t = lr * sched_fn(progress, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)
        upd = -lr_t * (m / (jnp.sqrt(v) + eps) + weight_decay * state.flat)
        if masked:
            upd = upd * state.trainable
        new = FlatTrainState(flat=state.flat + upd, m=m, v=v,
                             trainable=state.trainable,
                             step=state.step + 1)
        return new, metrics

    return train_step


def make_flat_train_step(cfg, model, spec: FlatSpec, *, donate: bool = True,
                         **kw):
    """Returns jitted train_step(state, batch, rng) -> (state, metrics)."""
    body = _flat_step_body(cfg, model, spec, **kw)
    return jax.jit(body, donate_argnums=(0,) if donate else ())


def make_flat_multi_step(cfg, model, spec: FlatSpec, *, donate: bool = True,
                         **kw):
    """k train steps in ONE device program: lax.scan of the step body over k
    pre-staged batches (leading axis k on every batch leaf) and k per-step
    PRNG keys.

    Dispatch amortization (steps-per-loop): on per-thunk-dispatch backends
    (the axon relay, ROUND1_NOTES) the host pays ~0.2 ms per thunk per step;
    one launch per k steps pays per-launch host work once — measured b64
    flagship: 130 -> 152 clips/s/chip at k=8 (the residual ~420 ms/step is
    the device program itself).  On normal TPU runtimes this is the standard
    host-loop amortization; it also shrinks per-step host Python anywhere.

    Because the caller passes the SAME per-step keys it would have fed k
    single-step calls, the result is numerically identical to k sequential
    ``make_flat_train_step`` calls — bit-exact on like-for-like compiled
    bodies; at full-model scale XLA fuses the scanned body slightly
    differently (~1e-5 relative after several BertAdam steps).  Locked by
    tests/test_flat_state.py.

    Returns multi_step(state, batches, rngs) -> (state, stacked metrics
    dict with leading axis k).
    """
    body = _flat_step_body(cfg, model, spec, **kw)

    def multi_step(state, batches, rngs):
        def scan_body(carry, inp):
            batch, k = inp
            new, metrics = body(carry, batch, k)
            return new, metrics

        return jax.lax.scan(scan_body, state, (batches, rngs))

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())
