#!/usr/bin/env python
"""Prototype: batch the rel+act HG decoders into one stacked program.

Motivation (PERF.md §2, round-3 verdict item 6): the two DETR decoders
(rel: 128 queries, act: 48 queries, 5 layers each) issue 20 small unfused
MHA sites ≈ 25 ms/step of the b64 train profile.  They are same-shape
modulo query count, so the candidate formulation pads act queries 48 -> 128
and runs BOTH stacks as one batched program: every weight gets a leading
(2,) decoder axis, each attention becomes one einsum over (2, B, Q, D), and
the launch count halves (10 sites).  The cost is ~1.45x decoder-query FLOPs
(48 -> 128 padding) — worth it only if the sites are overhead-bound.

Measures on-chip, flagship dims (B=64, D=768, H=12, FFN 2048, M=393):
  1. forward: separate loop vs batched
  2. forward+backward (train shape): separate vs batched
  3. numerics: batched == separate on the real (unpadded) queries

Run ON the TPU: python tools/proto_dual_decoder.py   (CPU works, slower)
Env: PROTO_B (batch, default 64), PROTO_ITERS (default 30).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PROTO_B", "64"))
ITERS = int(os.environ.get("PROTO_ITERS", "30"))
D, H, FFN, M = 768, 12, 2048, 393
LAYERS = 5
QR, QA = 128, 48          # rel / act query counts; padded axis = QR
HD = D // H


def _mk_weights(rng, stacked):
    """Per-layer decoder weights; leading (2,) axis when stacked."""
    def w(*shape):
        s = (2,) + shape if stacked else shape
        return np.asarray(rng.randn(*s) * 0.02, np.float32)

    layers = []
    for _ in range(LAYERS):
        layers.append(dict(
            sa_in=w(D, 3 * D), sa_in_b=w(3 * D),
            sa_out=w(D, D), sa_out_b=w(D),
            ca_in=w(D, 3 * D), ca_in_b=w(3 * D),
            ca_out=w(D, D), ca_out_b=w(D),
            l1=w(D, FFN), l1_b=w(FFN), l2=w(FFN, D), l2_b=w(D),
            n1s=w(D) * 0 + 1, n1b=w(D) * 0,
            n2s=w(D) * 0 + 1, n2b=w(D) * 0,
            n3s=w(D) * 0 + 1, n3b=w(D) * 0,
        ))
    return layers


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    # PROTO_DT=f32 for a strict numerics check (bf16 differs by tiling:
    # the padded act stack runs Q=128 tiles where separate runs Q=48).
    # Force true-f32 matmuls: the TPU MXU default is bf16-multiply even on
    # f32 arrays (measured 7-8e-3 max|d| on DEFAULT precision).
    dt = (jnp.float32 if os.environ.get("PROTO_DT") == "f32"
          else jnp.bfloat16)
    if dt == jnp.float32:
        jax.config.update("jax_default_matmul_precision", "highest")

    memory = jnp.asarray(rng.randn(B, M, D) * 0.1, dt)
    q_rel = jnp.asarray(rng.randn(B, QR, D) * 0.1, dt)
    q_act = jnp.asarray(rng.randn(B, QA, D) * 0.1, dt)
    # situation-causal additive masks (16 situations x 8 / 3 slots)
    def causal(q, slots):
        s = 16
        m = np.zeros((q, q), np.float32)
        sit = np.arange(q) // slots
        m[sit[:, None] < sit[None, :]] = -1e9
        return m

    mask_rel = jnp.asarray(causal(QR, 8))
    mask_act_small = causal(QA, 3)
    # padded act mask: pad queries attend only to themselves (finite row),
    # real queries never attend to pads
    mask_act = np.full((QR, QR), -1e9, np.float32)
    mask_act[:QA, :QA] = mask_act_small
    np.fill_diagonal(mask_act, np.maximum(np.diag(mask_act), 0.0))
    mask_act = jnp.asarray(mask_act)

    w_rel = _mk_weights(np.random.RandomState(1), stacked=False)
    w_act = _mk_weights(np.random.RandomState(2), stacked=False)
    w_stacked = [{k: jnp.asarray(np.stack([la[k], lb[k]])) for k in la}
                 for la, lb in zip(w_rel, w_act)]
    w_rel = [{k: jnp.asarray(v) for k, v in l.items()} for l in w_rel]
    w_act = [{k: jnp.asarray(v) for k, v in l.items()} for l in w_act]

    def ln(x, s, b):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * s + b).astype(x.dtype)

    # ---- separate (current formulation) --------------------------------
    def mha(x_q, x_kv, w_in, b_in, w_out, b_out, mask):
        q = (x_q @ w_in[:, :D].astype(dt) + b_in[:D].astype(dt))
        k = (x_kv @ w_in[:, D:2 * D].astype(dt) + b_in[D:2 * D].astype(dt))
        v = (x_kv @ w_in[:, 2 * D:].astype(dt) + b_in[2 * D:].astype(dt))
        bq, lq = q.shape[:2]
        lk = k.shape[1]
        q = q.reshape(bq, lq, H, HD)
        k = k.reshape(bq, lk, H, HD)
        v = v.reshape(bq, lk, H, HD)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        s = s / np.sqrt(HD)
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, -1).astype(dt)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(bq, lq, D)
        return o @ w_out.astype(dt) + b_out.astype(dt)

    def decoder(qpos, mem, mask, ws):
        tgt = jnp.zeros_like(qpos)
        for w in ws:
            x = tgt + qpos
            sa = mha(x, x, w["sa_in"], w["sa_in_b"], w["sa_out"],
                     w["sa_out_b"], mask)
            tgt = ln(tgt + sa, w["n1s"], w["n1b"])
            ca = mha(tgt + qpos, mem, w["ca_in"], w["ca_in_b"], w["ca_out"],
                     w["ca_out_b"], None)
            tgt = ln(tgt + ca, w["n2s"], w["n2b"])
            h = jax.nn.relu(tgt @ w["l1"].astype(dt) + w["l1_b"].astype(dt))
            h = h @ w["l2"].astype(dt) + w["l2_b"].astype(dt)
            tgt = ln(tgt + h, w["n3s"], w["n3b"])
        return tgt

    def separate(w_rel, w_act, q_rel, q_act, memory):
        rel = decoder(q_rel, memory, mask_rel, w_rel)
        act = decoder(q_act, memory, mask_act_small_j, w_act)
        return rel, act

    mask_act_small_j = jnp.asarray(mask_act_small)

    # ---- batched (candidate) -------------------------------------------
    def mha2(x_q, x_kv, w_in, b_in, w_out, b_out, mask):
        # x_q: (2, B, Q, D); w_in: (2, D, 3D); mask: (2, Q, Q) or None
        q = jnp.einsum("nbqd,nde->nbqe", x_q, w_in[..., :D].astype(dt)) \
            + b_in[:, None, None, :D].astype(dt)
        k = jnp.einsum("nbkd,nde->nbke", x_kv, w_in[..., D:2 * D].astype(dt)) \
            + b_in[:, None, None, D:2 * D].astype(dt)
        v = jnp.einsum("nbkd,nde->nbke", x_kv, w_in[..., 2 * D:].astype(dt)) \
            + b_in[:, None, None, 2 * D:].astype(dt)
        n, bq, lq = q.shape[:3]
        lk = k.shape[2]
        q = q.reshape(n, bq, lq, H, HD)
        k = k.reshape(n, bq, lk, H, HD)
        v = v.reshape(n, bq, lk, H, HD)
        s = jnp.einsum("nbqhd,nbkhd->nbhqk", q, k).astype(jnp.float32)
        s = s / np.sqrt(HD)
        if mask is not None:
            s = s + mask[:, None, None]
        p = jax.nn.softmax(s, -1).astype(dt)
        o = jnp.einsum("nbhqk,nbkhd->nbqhd", p, v).reshape(n, bq, lq, D)
        return jnp.einsum("nbqd,nde->nbqe", o, w_out.astype(dt)) \
            + b_out[:, None, None].astype(dt)

    masks2 = jnp.stack([mask_rel, mask_act])

    def batched(w_stacked, q_rel, q_act, memory):
        q_act_pad = jnp.pad(q_act, ((0, 0), (0, QR - QA), (0, 0)))
        qpos = jnp.stack([q_rel, q_act_pad])            # (2, B, 128, D)
        mem2 = jnp.broadcast_to(memory[None], (2,) + memory.shape)
        tgt = jnp.zeros_like(qpos)
        for w in w_stacked:
            x = tgt + qpos
            sa = mha2(x, x, w["sa_in"], w["sa_in_b"], w["sa_out"],
                      w["sa_out_b"], masks2)
            tgt = ln(tgt + sa, w["n1s"][:, None, None],
                     w["n1b"][:, None, None])
            ca = mha2(tgt + qpos, mem2, w["ca_in"], w["ca_in_b"],
                      w["ca_out"], w["ca_out_b"], None)
            tgt = ln(tgt + ca, w["n2s"][:, None, None],
                     w["n2b"][:, None, None])
            h = jax.nn.relu(
                jnp.einsum("nbqd,nde->nbqe", tgt, w["l1"].astype(dt))
                + w["l1_b"][:, None, None].astype(dt))
            h = jnp.einsum("nbqe,ned->nbqd", h, w["l2"].astype(dt)) \
                + w["l2_b"][:, None, None].astype(dt)
            tgt = ln(tgt + h, w["n3s"][:, None, None],
                     w["n3b"][:, None, None])
        return tgt[0], tgt[1, :, :QA]

    # ---- numerics check -------------------------------------------------
    sep = jax.jit(separate)
    bat = jax.jit(batched)
    r1, a1 = jax.device_get(sep(w_rel, w_act, q_rel, q_act, memory))
    r2, a2 = jax.device_get(bat(w_stacked, q_rel, q_act, memory))
    rel_err = np.abs(np.float32(r1) - np.float32(r2)).max()
    act_err = np.abs(np.float32(a1) - np.float32(a2)).max()
    print(f"numerics: rel max|d|={rel_err:.3e} act max|d|={act_err:.3e}")
    # bf16: measured rel EXACT 0 (same Q=128 tiling both ways) and act
    # 6.3e-2 (Q=48 vs padded-128 tile shapes round differently over 5
    # layers); f32 (PROTO_DT=f32) pins the formulation itself
    tol = 1e-4 if dt == jnp.float32 else 1e-1
    assert rel_err < tol and act_err < tol, "batched != separate"

    # ---- timing ---------------------------------------------------------
    def timeit(fn, *args):
        outs = fn(*args)
        _ = float(jnp.asarray(outs[0]).astype(jnp.float32).sum())  # compile
        t0 = time.perf_counter()
        res = None
        for _ in range(ITERS):
            res = fn(*args)
        _ = float(jnp.asarray(res[0]).astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / ITERS * 1e3

    t_sep = timeit(sep, w_rel, w_act, q_rel, q_act, memory)
    t_bat = timeit(bat, w_stacked, q_rel, q_act, memory)
    print(f"forward  b{B}: separate {t_sep:7.2f} ms   batched {t_bat:7.2f} ms")

    def loss_sep(w_rel, w_act):
        r, a = separate(w_rel, w_act, q_rel, q_act, memory)
        return (r.astype(jnp.float32) ** 2).mean() \
            + (a.astype(jnp.float32) ** 2).mean()

    def loss_bat(w_stacked):
        r, a = batched(w_stacked, q_rel, q_act, memory)
        return (r.astype(jnp.float32) ** 2).mean() \
            + (a.astype(jnp.float32) ** 2).mean()

    g_sep = jax.jit(jax.grad(loss_sep, argnums=(0, 1)))
    g_bat = jax.jit(jax.grad(loss_bat))

    def timeit_g(fn, *args):
        outs = fn(*args)
        leaf = jax.tree_util.tree_leaves(outs)[0]
        _ = float(jnp.asarray(leaf).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        res = None
        for _ in range(ITERS):
            res = fn(*args)
        leaf = jax.tree_util.tree_leaves(res)[0]
        _ = float(jnp.asarray(leaf).astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / ITERS * 1e3

    tg_sep = timeit_g(g_sep, w_rel, w_act)
    tg_bat = timeit_g(g_bat, w_stacked)
    print(f"fwd+bwd  b{B}: separate {tg_sep:7.2f} ms   batched "
          f"{tg_bat:7.2f} ms")
    print(f"delta: fwd {t_sep - t_bat:+.2f} ms, train {tg_sep - tg_bat:+.2f}"
          " ms (positive = batched wins)")


if __name__ == "__main__":
    main()
