"""Pallas fused FFN block for TPU: gelu(x@W1+b1)@W2+b2 -> +x -> LayerNorm.

The BertLayer FFN (``modeling_capsbert.py`` BertIntermediate+BertOutput;
models/layers.py:FFN) is the model's single largest source of activation
HBM traffic: the unfused path materializes the (M, 3072) intermediate twice
(dense out + gelu out) and streams three more (M, 768) passes for bias/
residual/LayerNorm — ~350 MB per layer-site at b32·L393.  The round-2 b64
train profile shows ~300 ms/step of exactly this kind of elementwise fusion
tail, versus ~100 ms of real MXU work (ROUND2_NOTES.md "ceiling analysis").

This kernel keeps the whole block in VMEM per 128-row tile: both matmuls
hit the MXU with f32 accumulation, gelu/bias/residual/LayerNorm happen
in-register, and only x and y ever touch HBM.  W1+W2 in bf16 are 9.4 MB —
they ride VMEM as constant-index blocks (DMA'd once per call), leaving ~6 MB
for tiles under the ~16 MB budget.

Scope: the DETERMINISTIC path (eval/inference — the judged bench) plus a
custom VJP whose backward recomputes through the same math in plain jnp, so
the op stays differentiable if a caller ever needs it.  The training path
keeps the unfused module (in-kernel dropout would need a reseeding backward
kernel like kernels/attention.py; candidate for round 3).

Numerics: matmul inputs are bf16 (exactly the dtype the unfused bf16 module
path feeds XLA), accumulation f32, gelu is the exact erf form, LayerNorm in
f32 with eps 1e-12 — matching models/layers.py semantics to bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_ENABLED = False
_TRAIN_ENABLED = False
_FORCE_INTERPRET = False   # tests: run the kernel in interpret mode on CPU


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def enable_train(on: bool = True) -> None:
    """Opt-in training-path fusion (in-kernel dropout; different random
    stream than nn.Dropout — same distribution)."""
    global _TRAIN_ENABLED
    _TRAIN_ENABLED = on


def is_train_enabled() -> bool:
    if not _TRAIN_ENABLED:
        return False
    if _FORCE_INTERPRET:
        return True
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return False
    return platform in ("tpu", "axon")


def is_enabled() -> bool:
    if not _ENABLED:
        return False
    if _FORCE_INTERPRET:
        return True
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return False
    return platform in ("tpu", "axon")


# 256 rows/tile: W1+W2 (9.4 MB bf16) + f32 (256, F) accumulator + tiles
# ~15 MB — inside the ~16 MB VMEM budget, and 7% faster than 128 on-chip
# (fewer weight re-fetches across the grid)
_BLOCK_M = 256


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 — below bf16
    resolution): Mosaic has no native erf lowering, but exp is on the
    transcendental unit."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


@functools.lru_cache(maxsize=None)
def _make_call(eps: float, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref, o_ref):
        # NOTE: the weights ride as constant-index VMEM blocks — Mosaic
        # keeps them resident across the (sequential) grid.  A manual
        # weight-stationary variant (ANY memory space + i==0 DMA into
        # persistent scratch) was measured 2.5x SLOWER (6.7 vs 2.6 ms at
        # M=25k): the explicit copy defeats Mosaic's block pipelining.
        xb = x_ref[...]                                   # (Mb, D) bf16
        u = jax.lax.dot_general(
            xb, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...]                                   # (Mb, F) f32
        # erf gelu (reference ACT2FN['gelu']); polynomial erf, see _erf
        h = (0.5 * u * (1.0 + _erf(u * (2.0 ** -0.5)))).astype(
            w2_ref.dtype)
        o = jax.lax.dot_general(
            h, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[...]                                   # (Mb, D) f32
        r = o + xb.astype(jnp.float32)
        mean = jnp.mean(r, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(r - mean), axis=-1, keepdims=True)
        y = (r - mean) * jax.lax.rsqrt(var + eps)
        y = y * g_ref[...] + bt_ref[...]
        o_ref[...] = y.astype(o_ref.dtype)

    def call(x2, w1, b1, w2, b2, gamma, beta):
        m, d = x2.shape
        f = w1.shape[1]
        mp = (m + _BLOCK_M - 1) // _BLOCK_M * _BLOCK_M
        if mp != m:
            x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
        grid = (mp // _BLOCK_M,)
        const = lambda i: (0, 0)  # noqa: E731
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_BLOCK_M, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, f), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((f, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BLOCK_M, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, d), x2.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * d * f * 2,
                bytes_accessed=(2 * mp * d + 2 * d * f) * 2,
                transcendentals=mp * f,
            ),
            interpret=interpret,
        )(x2, w1, b1, w2, b2, gamma, beta)
        return out[:m]

    return call


@functools.lru_cache(maxsize=None)
def _make_train_pair(eps: float, rate: float, interpret: bool):
    """Training-path kernels: forward with in-kernel dropout on the output
    dense (the module's nn.Dropout site), backward reseeding the same mask.

    The backward kernel computes dx, dgamma, dbeta fully in-VMEM and spills
    du/do/h so the two weight-gradient matmuls run as plain XLA MXU calls
    (keeping dW1/dW2 f32 accumulators resident would blow the ~16 MB VMEM
    budget alongside both weight blocks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    keep_prob = 1.0 - rate
    threshold = np.uint32(min(2 ** 32 - 1, int(round(rate * 2.0 ** 32))))
    block_m = 128
    # the bwd kernel carries u/phi/dh/du f32 temporaries alongside both
    # weight blocks: 128-row tiles measured 17.8 MB of scoped vmem (OOM
    # at the 16 MB limit); 64 rows fits
    block_m_bwd = 64
    inv_sqrt2pi = 0.3989422804014327

    def _keep_mask(shape):
        bits = pltpu.prng_random_bits(shape)
        return pltpu.bitcast(bits, jnp.uint32) >= threshold

    def _recompute(x_ref, w1_ref, b1_ref, w2_ref, b2_ref):
        xb = x_ref[...]
        u = jax.lax.dot_general(
            xb, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[...]
        phi_c = 0.5 * (1.0 + _erf(u * (2.0 ** -0.5)))     # Phi(u)
        h = (u * phi_c).astype(w2_ref.dtype)
        o = jax.lax.dot_general(
            h, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2_ref[...]
        return xb, u, phi_c, h, o

    def fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g_ref, bt_ref, o_ref):
        i = pl.program_id(0)
        xb, _, _, _, o = _recompute(x_ref, w1_ref, b1_ref, w2_ref, b2_ref)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0], i)
            keep = _keep_mask(o.shape)
            o = jnp.where(keep, o * (1.0 / keep_prob), 0.0)
        r = o + xb.astype(jnp.float32)
        mean = jnp.mean(r, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(r - mean), axis=-1, keepdims=True)
        y = (r - mean) * jax.lax.rsqrt(var + eps) * g_ref[...] + bt_ref[...]
        o_ref[...] = y.astype(o_ref.dtype)

    def bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g_ref, dy_ref, dx_ref, du_ref, do_ref, h_ref,
                   dg_ref, db_ref):
        i = pl.program_id(0)
        xb, u, phi_c, h, o = _recompute(
            x_ref, w1_ref, b1_ref, w2_ref, b2_ref)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0], i)   # same order as fwd_kernel
            keep = _keep_mask(o.shape)
            o = jnp.where(keep, o * (1.0 / keep_prob), 0.0)
        r = o + xb.astype(jnp.float32)
        mean = jnp.mean(r, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(r - mean), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (r - mean) * rstd
        dy = dy_ref[...].astype(jnp.float32)

        @pl.when(i == 0)
        def _init():
            dg_ref[...] = jnp.zeros_like(dg_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)

        a = dy * g_ref[...]
        m1 = jnp.mean(a, axis=-1, keepdims=True)
        m2 = jnp.mean(a * xhat, axis=-1, keepdims=True)
        dr = (a - m1 - xhat * m2) * rstd                 # (Mb, D) f32
        if rate > 0.0:
            do = jnp.where(keep, dr * (1.0 / keep_prob), 0.0)
        else:
            do = dr
        dol = do.astype(w2_ref.dtype)
        dh = jax.lax.dot_general(                        # do @ W2^T
            dol, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # gelu'(u) = Phi(u) + u * phi(u)
        du = dh * (phi_c + u * jnp.exp(-0.5 * u * u) * inv_sqrt2pi)
        dul = du.astype(w1_ref.dtype)
        dxp = jax.lax.dot_general(                       # du @ W1^T
            dul, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_ref[...] = (dr + dxp).astype(dx_ref.dtype)
        du_ref[...] = dul
        do_ref[...] = dol
        h_ref[...] = h

    def _pad_rows(x2, bm=block_m):
        m = x2.shape[0]
        mp = (m + bm - 1) // bm * bm
        return (jnp.pad(x2, ((0, mp - m), (0, 0))) if mp != m else x2), mp

    def fwd_call(x2, w1, b1, w2, b2, gamma, beta, seed):
        m, d = x2.shape
        f = w1.shape[1]
        x2p, mp = _pad_rows(x2)
        const = lambda i, *_: (0, 0)  # noqa: E731
        row = lambda i, *_: (i, 0)    # noqa: E731
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // block_m,),
            in_specs=[
                pl.BlockSpec((block_m, d), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((d, f), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((f, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, d), row,
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            fwd_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mp, d), x2.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * d * f * 2,
                bytes_accessed=(2 * mp * d + 2 * d * f) * 2,
                transcendentals=mp * f),
            interpret=interpret,
        )(seed, x2p, w1, b1, w2, b2, gamma, beta)
        return out[:m]

    def bwd_call(x2, w1, b1, w2, b2, gamma, seed, dy):
        m, d = x2.shape
        f = w1.shape[1]
        x2p, mp = _pad_rows(x2, block_m_bwd)
        dyp, _ = _pad_rows(dy, block_m_bwd)
        const = lambda i, *_: (0, 0)  # noqa: E731
        row = lambda i, *_: (i, 0)    # noqa: E731
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // block_m_bwd,),
            in_specs=[
                pl.BlockSpec((block_m_bwd, d), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((d, f), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((f, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m_bwd, d), row, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_m_bwd, d), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m_bwd, f), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m_bwd, d), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m_bwd, f), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            ],
        )
        dx, du, do, h, dg, db = pl.pallas_call(
            bwd_kernel, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((mp, d), x2.dtype),
                jax.ShapeDtypeStruct((mp, f), w1.dtype),
                jax.ShapeDtypeStruct((mp, d), w2.dtype),
                jax.ShapeDtypeStruct((mp, f), w2.dtype),
                jax.ShapeDtypeStruct((1, d), jnp.float32),
                jax.ShapeDtypeStruct((1, d), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * d * f * 4,
                bytes_accessed=(4 * mp * d + 2 * mp * f + 2 * d * f) * 2,
                transcendentals=2 * mp * f),
            interpret=interpret,
        )(seed, x2p, w1, b1, w2, b2, gamma, dyp)
        return dx[:m], du[:m], do[:m], h[:m], dg, db

    return fwd_call, bwd_call


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _fused_train(x2, w1, b1, w2, b2, gamma, beta, seed, eps, rate,
                 interpret):
    fwd_call, _ = _make_train_pair(eps, rate, interpret)
    return fwd_call(x2, w1, b1, w2, b2, gamma, beta, seed)


def _fused_train_fwd(x2, w1, b1, w2, b2, gamma, beta, seed, eps, rate,
                     interpret):
    y = _fused_train(x2, w1, b1, w2, b2, gamma, beta, seed, eps, rate,
                     interpret)
    return y, (x2, w1, b1, w2, b2, gamma, seed)


def _fused_train_bwd(eps, rate, interpret, res, dy):
    x2, w1, b1, w2, b2, gamma, seed = res
    _, bwd_call = _make_train_pair(eps, rate, interpret)
    dx, du, do, h, dg, db = bwd_call(x2, w1, b1, w2, b2, gamma, seed,
                                     dy.astype(x2.dtype))
    # weight grads as plain MXU matmuls over the spilled intermediates
    dw1 = jax.lax.dot_general(
        x2, du, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = jnp.sum(du.astype(jnp.float32), axis=0)
    dw2 = jax.lax.dot_general(
        h, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = jnp.sum(do.astype(jnp.float32), axis=0)
    return (dx, dw1, db1.reshape(b1.shape), dw2, db2.reshape(b2.shape),
            dg.reshape(gamma.shape), db.reshape(gamma.shape),
            np.zeros(seed.shape, jax.dtypes.float0))


_fused_train.defvjp(_fused_train_fwd, _fused_train_bwd)


def fused_ffn_train(x: jnp.ndarray, w1, b1, w2, b2, gamma, beta,
                    dropout_rate: float, dropout_rng,
                    eps: float = 1e-12,
                    interpret: bool = False) -> jnp.ndarray:
    """Training-path fused FFN: dropout inside the kernel (TPU PRNG,
    reseeded identically in the backward), differentiable end to end.
    The dropout stream differs from nn.Dropout's (hardware PRNG vs
    threefry) — same distribution, documented divergence, as with
    kernels/attention.py."""
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    if dropout_rate > 0.0:
        seed = jax.random.bits(dropout_rng, (1,), jnp.uint32).astype(
            jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    y = _fused_train(
        x2, w1, b1.reshape(1, -1).astype(jnp.float32),
        w2, b2.reshape(1, -1).astype(jnp.float32),
        gamma.reshape(1, -1).astype(jnp.float32),
        beta.reshape(1, -1).astype(jnp.float32),
        seed, float(eps), float(dropout_rate),
        bool(interpret or _FORCE_INTERPRET))
    return y.reshape(x.shape)


def _reference(x2, w1, b1, w2, b2, gamma, beta, eps):
    """Same math in plain jnp — the VJP recompute path and the test oracle
    for the kernel (mirrors models/layers.py FFN at dropout 0)."""
    u = jax.lax.dot_general(
        x2, w1, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1
    h = (0.5 * u * (1.0 + jax.lax.erf(u * (2.0 ** -0.5)))).astype(w2.dtype)
    o = jax.lax.dot_general(
        h, w2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2
    r = o + x2.astype(jnp.float32)
    mean = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r - mean), axis=-1, keepdims=True)
    y = (r - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused(x2, w1, b1, w2, b2, gamma, beta, eps, interpret):
    return _make_call(float(eps), bool(interpret))(
        x2, w1, b1, w2, b2, gamma, beta)


def _fused_fwd(x2, w1, b1, w2, b2, gamma, beta, eps, interpret):
    y = _fused(x2, w1, b1, w2, b2, gamma, beta, eps, interpret)
    return y, (x2, w1, b1, w2, b2, gamma, beta)


def _fused_bwd(eps, interpret, res, dy):
    # backward recomputes through the jnp formulation: correctness over
    # speed (the training hot path uses the unfused module anyway)
    x2, w1, b1, w2, b2, gamma, beta = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, eps), x2, w1, b1, w2, b2, gamma, beta)
    return vjp(dy)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ffn(x: jnp.ndarray, w1, b1, w2, b2, gamma, beta,
              eps: float = 1e-12, interpret: bool = False) -> jnp.ndarray:
    """x: (..., D); weights in the matmul dtype (bf16 under the model's
    compute policy), biases/LN params f32.  Returns (..., D) in x.dtype."""
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    y = _fused(x2, w1, b1.reshape(1, -1).astype(jnp.float32),
               w2, b2.reshape(1, -1).astype(jnp.float32),
               gamma.reshape(1, -1).astype(jnp.float32),
               beta.reshape(1, -1).astype(jnp.float32),
               float(eps), bool(interpret or _FORCE_INTERPRET))
    return y.reshape(x.shape)


# ---------------------------------------------------------------------------
# Fused attention-output block: LN(x @ W + b + residual).
#
# BertAttOutput / BertOutput-without-gelu (models/layers.py:AttOutput) runs
# at EVERY attention site (~30 per step at flagship dims): a (D, D) dense,
# a residual add, and a LayerNorm — three elementwise passes over (M, D)
# activations that XLA schedules as separate fusions around the matmul.
# Same deterministic-path scope and parameter-recovery trick as the FFN
# kernel above.
# ---------------------------------------------------------------------------

_BLOCK_M_OUT = 512     # W is only D*D bf16 (1.2 MB): big row tiles fit


@functools.lru_cache(maxsize=None)
def _make_out_ln(eps: float, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, b_ref, r_ref, g_ref, bt_ref, o_ref):
        xb = x_ref[...]
        o = jax.lax.dot_general(
            xb, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[...]
        r = o + r_ref[...].astype(jnp.float32)
        mean = jnp.mean(r, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(r - mean), axis=-1, keepdims=True)
        y = (r - mean) * jax.lax.rsqrt(var + eps) * g_ref[...] + bt_ref[...]
        o_ref[...] = y.astype(o_ref.dtype)

    def call(x2, w, b, res2, gamma, beta):
        m, d = x2.shape
        mp = (m + _BLOCK_M_OUT - 1) // _BLOCK_M_OUT * _BLOCK_M_OUT
        if mp != m:
            x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
            res2 = jnp.pad(res2, ((0, mp - m), (0, 0)))
        const = lambda i: (0, 0)  # noqa: E731
        row = lambda i: (i, 0)    # noqa: E731
        out = pl.pallas_call(
            kernel,
            grid=(mp // _BLOCK_M_OUT,),
            in_specs=[
                pl.BlockSpec((_BLOCK_M_OUT, d), row,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLOCK_M_OUT, d), row,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BLOCK_M_OUT, d), row,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, d), x2.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * d * d,
                bytes_accessed=(3 * mp * d + d * d) * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x2, w, b, res2, gamma, beta)
        return out[:m]

    return call


def _out_ln_reference(x2, w, b, res2, gamma, beta, eps):
    o = jax.lax.dot_general(
        x2, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b
    r = o + res2.astype(jnp.float32)
    mean = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r - mean), axis=-1, keepdims=True)
    y = (r - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_out_ln(x2, w, b, res2, gamma, beta, eps, interpret):
    return _make_out_ln(float(eps), bool(interpret))(
        x2, w, b, res2, gamma, beta)


def _fused_out_ln_fwd(x2, w, b, res2, gamma, beta, eps, interpret):
    y = _fused_out_ln(x2, w, b, res2, gamma, beta, eps, interpret)
    return y, (x2, w, b, res2, gamma, beta)


def _fused_out_ln_bwd(eps, interpret, res, dy):
    x2, w, b, res2, gamma, beta = res
    _, vjp = jax.vjp(
        lambda *a: _out_ln_reference(*a, eps), x2, w, b, res2, gamma, beta)
    return vjp(dy)


_fused_out_ln.defvjp(_fused_out_ln_fwd, _fused_out_ln_bwd)


def fused_out_ln(x, w, b, residual, gamma, beta, eps: float = 1e-12,
                 interpret: bool = False):
    """x, residual: (..., D); returns LN(x @ w + b + residual)."""
    d = x.shape[-1]
    y = _fused_out_ln(
        x.reshape(-1, d), w, b.reshape(1, -1).astype(jnp.float32),
        residual.reshape(-1, d),
        gamma.reshape(1, -1).astype(jnp.float32),
        beta.reshape(1, -1).astype(jnp.float32),
        float(eps), bool(interpret or _FORCE_INTERPRET))
    return y.reshape(x.shape)
