"""Pallas fused attention for TPU — forward AND backward kernels.

All attention in this model runs over short sequences (text 40, visual 393,
hypergraph 177, decoder queries 128), so each (batch, head) attention problem
fits entirely in VMEM: QK^T, additive mask, f32 softmax, dropout, and PV run
in a single pass with no HBM round-trip for the score matrix.  The unfused
XLA path materializes (B, H, Lq, Lk) f32 scores in HBM twice (softmax in /
out) and emits ~6 thunks per attention site; the kernel emits 1 — on
per-op-dispatch backends (remote relays) the thunk reduction alone is worth
more than the bandwidth (see ROUND1_NOTES).

Design notes (v2, round 2):

- **Masks travel compact.**  The model only ever uses two mask shapes: a
  key-padding mask broadcast as (B, 1, 1, Lk) (``extend_mask``,
  models/layers.py) and a shared query-key mask (Lq, Lk) (the
  situation-causal ``tgt_mask``, ``lxrt/entry.py:114-121``).  The wrapper
  decomposes whatever it is handed into a per-batch key row (B, Lk) plus one
  shared (Lq, Lk) pane instead of materializing (B, H, Lq, Lk) f32 in HBM
  (which at B32/H12/393² is ~400 MB per call — the round-1 kernel's main
  perf bug).  Blocks with constant index maps are DMA'd once, not per
  program.
- **Dropout inside the kernel** via the TPU PRNG (`pltpu.prng_random_bits`),
  seeded per (batch·head) program; the backward kernel reseeds identically
  and regenerates the same keep-mask, so training can use the fused path.
- **Custom VJP**: backward recomputes the probs from a saved per-row
  logsumexp (flash-attention style) and produces dq/dk/dv in one kernel.
- Head dim stays at its native size (64); only sequence dims pad to 128.

Numerics match the jnp path to f32-softmax accuracy on-chip
(tools/bench_pallas.py; tests/test_pallas_attention.py covers interpret
mode).  Enable globally with ``enable(True)`` (the Trainer does this when
``Config.use_pallas_attention`` is set); on non-TPU backends callers always
fall back to the jnp path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_ENABLED = False
_TRAIN_ENABLED = True
_DECODER_ENABLED = False

def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def enable_train(on: bool = True) -> None:
    """Scope the fused kernel to TRAINING attention sites (deterministic=
    False).  The split exists because the A/B verdicts differ by direction:
    inference loses with the kernel (307 vs 322 clips/s — XLA's fused
    softmax path wins when there is no dropout), while training WINS
    (b64: 527 -> 490 ms/step) because the XLA path materializes f32 probs
    plus a u32[B,H,L,L] dropout-bit tensor per layer (~474 MB each at b64,
    plus layout-fix copies) that the kernel's in-kernel dropout never
    writes.  Default ON (platform-gated); cfg.use_pallas_attention_train /
    --noPallasAttentionTrain control it from the drivers."""
    global _TRAIN_ENABLED
    _TRAIN_ENABLED = on


def enable_decoder(on: bool = True) -> None:
    """Scope the fused kernel to the DETR decoder MHA sites only.  The big
    encoder attentions lower well under XLA (round-2 A/B: 307 vs 322
    clips/s with the kernel everywhere), but the decoder's softmax+convert
    materializes a transposed (B, H, Q, K) layout that costs ~8 ms/step at
    b32 — the fused kernel never materializes probs at all."""
    global _DECODER_ENABLED
    _DECODER_ENABLED = on


def _platform_ok() -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return False
    return platform in ("tpu", "axon")


def is_enabled() -> bool:
    return _ENABLED and _platform_ok()


def is_train_enabled() -> bool:
    return _TRAIN_ENABLED and _platform_ok()


def is_decoder_enabled() -> bool:
    return (_ENABLED or _DECODER_ENABLED) and _platform_ok()


def _decompose_mask(mask, b, h, lq, lk):
    """Split an additive mask broadcastable to (B, H, Lq, Lk) into a
    per-batch key row (B, 1, Lk) and a shared pane (Lq, Lk) — the only two
    shapes this model uses (extend_mask key-padding masks and the
    situation-causal tgt_mask).  No sequence padding: Mosaic accepts blocks
    equal to the (unaligned) array dims and tiles internally, so the kernel
    runs at the logical 393/177/40 sizes instead of 512/256/128.

    Returns (key_mask, pair_mask, ok).  ok=False = the mask genuinely varies
    per head or per (batch, query) jointly — unsupported, callers raise."""
    key = jnp.zeros((b, 1, lk), jnp.float32)
    pair = jnp.zeros((lq, lk), jnp.float32)
    if mask is None:
        return key, pair, True
    m = jnp.asarray(mask, jnp.float32)
    if m.ndim == 2:  # (Lq, Lk) shared
        m = m[None, None]
    if m.ndim != 4 or (m.shape[1] != 1 and h != 1):
        return key, pair, False
    mb, _, mq, mk = m.shape
    if mq == 1:  # key-only mask, per batch or shared
        key = jnp.broadcast_to(m[:, 0, :, :], (b, 1, lk))
        return key, pair, True
    if mb == 1:  # shared (Lq, Lk) pane (e.g. causal tgt_mask)
        pair = jnp.broadcast_to(m[0, 0], (lq, lk))
        return key, pair, True
    return key, pair, False


@functools.lru_cache(maxsize=None)
def _make_core(h: int, dropout_rate: float, interpret: bool):
    """Build the custom-VJP attention core for a given head count /
    dropout rate.  Operates on flattened (G=B·H, L_p, D) arrays."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    keep_prob = 1.0 - dropout_rate
    # uint32 threshold: keep when bits >= threshold
    threshold = np.uint32(min(2**32 - 1, int(round(dropout_rate * 2.0**32))))

    def _dropout_mask(shape):
        bits = pltpu.prng_random_bits(shape)
        return pltpu.bitcast(bits, jnp.uint32) >= threshold

    def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, km_ref, pm_ref,
                    o_ref, lse_ref):
        g = pl.program_id(0)
        qb = q_ref[0]                       # (lq_p, d)
        kb = k_ref[0]                       # (lk_p, d)
        vb = v_ref[0]
        d = qb.shape[-1]
        s = jax.lax.dot_general(
            qb, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (1.0 / (d ** 0.5))
        s = s + km_ref[0, 0][None, :] + pm_ref[...]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        lse_ref[0, 0] = (m + jnp.log(l))[:, 0]
        pn = p / l
        if dropout_rate > 0.0:
            pltpu.prng_seed(seed_ref[0], g)
            keep = _dropout_mask(pn.shape)
            pn = jnp.where(keep, pn * (1.0 / keep_prob), 0.0)
        o = jax.lax.dot_general(
            pn.astype(vb.dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = o.astype(o_ref.dtype)

    def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, km_ref, pm_ref,
                    lse_ref, do_ref, dq_ref, dk_ref, dv_ref):
        g = pl.program_id(0)
        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        dob = do_ref[0]
        d = qb.shape[-1]
        scale = 1.0 / (d ** 0.5)
        s = jax.lax.dot_general(
            qb, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + km_ref[0, 0][None, :] + pm_ref[...]
        p = jnp.exp(s - lse_ref[0, 0][:, None])        # normalized probs, f32
        if dropout_rate > 0.0:
            pltpu.prng_seed(seed_ref[0], g)
            keep = _dropout_mask(p.shape)
            pd = jnp.where(keep, p * (1.0 / keep_prob), 0.0)
        else:
            pd = p
        # dv = pd^T @ do
        dv = jax.lax.dot_general(
            pd.astype(dob.dtype), dob,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dpd = do @ v^T
        dpd = jax.lax.dot_general(
            dob, vb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            dp = jnp.where(keep, dpd * (1.0 / keep_prob), 0.0)
        else:
            dp = dpd
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)                       # (lq_p, lk_p) f32
        dsl = ds.astype(qb.dtype)
        dq = jax.lax.dot_general(
            dsl, kb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            dsl, qb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_ref[0] = dq.astype(dq_ref.dtype)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    def _specs(lq_p, lk_p, d):
        qs = pl.BlockSpec((1, lq_p, d), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
        ks = pl.BlockSpec((1, lk_p, d), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
        kms = pl.BlockSpec((1, 1, lk_p), lambda i, *_: (i // h, 0, 0),
                           memory_space=pltpu.VMEM)
        pms = pl.BlockSpec((lq_p, lk_p), lambda i, *_: (0, 0),
                           memory_space=pltpu.VMEM)
        return qs, ks, kms, pms

    def _fwd_call(q3, k3, v3, km, pm, seed):
        g, lq_p, d = q3.shape          # lq_p/lk_p: logical (unpadded) sizes
        lk_p = k3.shape[1]
        qs, ks, kms, pms = _specs(lq_p, lk_p, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[qs, ks, ks, kms, pms],
            out_specs=[
                qs,
                pl.BlockSpec((1, 1, lq_p), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        flops = 2 * g * (lq_p * lk_p * d * 2)
        out, lse = pl.pallas_call(
            _fwd_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((g, lq_p, d), q3.dtype),
                jax.ShapeDtypeStruct((g, 1, lq_p), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(q3.size + k3.size + v3.size) * q3.dtype.itemsize
                + (km.size + pm.size) * 4,
                transcendentals=g * lq_p * lk_p,
            ),
            interpret=interpret,
        )(seed, q3, k3, v3, km, pm)
        return out, lse

    def _bwd_call(q3, k3, v3, km, pm, seed, lse, do3):
        g, lq_p, d = q3.shape
        lk_p = k3.shape[1]
        qs, ks, kms, pms = _specs(lq_p, lk_p, d)
        lses = pl.BlockSpec((1, 1, lq_p), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[qs, ks, ks, kms, pms, lses, qs],
            out_specs=[qs, ks, ks],
        )
        flops = 2 * g * (lq_p * lk_p * d * 5)
        dq, dk, dv = pl.pallas_call(
            _bwd_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((g, lq_p, d), q3.dtype),
                jax.ShapeDtypeStruct((g, lk_p, d), k3.dtype),
                jax.ShapeDtypeStruct((g, lk_p, d), v3.dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=2 * (q3.size + k3.size + v3.size)
                * q3.dtype.itemsize + (km.size + pm.size) * 4,
                transcendentals=g * lq_p * lk_p,
            ),
            interpret=interpret,
        )(seed, q3, k3, v3, km, pm, lse, do3)
        return dq, dk, dv

    @jax.custom_vjp
    def core(q3, k3, v3, km, pm, seed):
        out, _ = _fwd_call(q3, k3, v3, km, pm, seed)
        return out

    def core_fwd(q3, k3, v3, km, pm, seed):
        out, lse = _fwd_call(q3, k3, v3, km, pm, seed)
        # named for remat policies (models/layers.py REMAT_POLICIES
        # "dots_attn"): saving out+lse lets policy-remat avoid replaying
        # the forward kernel just to rebuild the bwd residuals
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, "attn_out")
        lse = checkpoint_name(lse, "attn_lse")
        return out, (q3, k3, v3, km, pm, seed, lse)

    def core_bwd(res, do3):
        q3, k3, v3, km, pm, seed, lse = res
        dq, dk, dv = _bwd_call(q3, k3, v3, km, pm, seed, lse,
                               do3.astype(q3.dtype))
        return (dq, dk, dv,
                jnp.zeros(km.shape, km.dtype),
                jnp.zeros(pm.shape, pm.dtype),
                np.zeros(seed.shape, jax.dtypes.float0))

    core.defvjp(core_fwd, core_bwd)
    return core


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    dropout_rate: float = 0.0,
                    dropout_rng: Optional[jnp.ndarray] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """q: (B, H, Lq, D), k/v: (B, H, Lk, D), mask: additive broadcastable to
    (B, H, Lq, Lk) or None.  Returns (B, H, Lq, D) in q.dtype.

    Differentiable (custom VJP); with dropout_rate > 0 a dropout_rng key is
    required and the same keep-mask is regenerated in the backward pass."""
    b, h, lq, d = q.shape
    lk = k.shape[2]

    km, pm, ok = _decompose_mask(mask, b, h, lq, lk)
    if not ok:
        raise ValueError(
            f"unsupported mask shape {mask.shape} for fused attention")

    q3 = q.reshape(b * h, lq, d)
    k3 = k.reshape(b * h, lk, d)
    v3 = v.reshape(b * h, lk, d)

    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.bits(dropout_rng, (1,), jnp.uint32).astype(
            jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    core = _make_core(h, float(dropout_rate), bool(interpret))
    # key mask carries a singleton sublane axis: TPU blocks must have their
    # second-to-last dim divisible by 8 or equal to the array's — (1, 1, Lk)
    # of a (B, 1, Lk) array satisfies that; (1, Lk) of (B, Lk) does not.
    out = core(q3, k3, v3, km, pm, seed)
    return out.reshape(b, h, lq, d)
