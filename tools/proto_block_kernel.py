#!/usr/bin/env python
"""Prototype: fused ResNet bottleneck block as ONE Pallas kernel.

Motivation (b64 inference profile): the backbone res_2/res_3 stages are
HBM-bandwidth-bound — each bottleneck block streams ~8 GB through XLA's
per-op pipeline (conv_a out + conv_b in/out + conv_c in/out + residual +
relu) where a VMEM-resident formulation needs only read-x + write-y
(~3.3 GB).  Profiled per-block cost at b64 res_2: conv_a ~2.9 ms +
conv_b ~4 ms + conv_c ~4.2 ms + residual relu ~6.5 ms.

Kernel (stride 1, temporal kernel 1 — res_2/res_3 geometry; optional
projection for entry blocks):
  grid = (B*T,): one whole (H, W) frame per step, everything in VMEM
  conv_a 1x1 -> BN -> ReLU       as (HW, Ci) @ (Ci, Cm)
  conv_b 3x3 -> BN -> ReLU       via the FLAT-ROW trick: pad to
      (H+2, W+2), flatten rows; each tap is a CONTIGUOUS row-slice dot
      over the interior band — no gather, no reshape-of-slice
  conv_c 1x1 -> BN               as (band, Cm) @ (Cm, Co)
  + residual (x or BN(proj(x))) -> ReLU -> store valid interior

BN is pre-folded outside the kernel to bf16 (scale', bias') exactly like
FrozenBatchNorm (f32 fold then cast), so numerics match the XLA path.

This prototype checks numerics vs the XLA op-by-op reference and times
both at res_2 dims.  Run ON the TPU: python tools/proto_block_kernel.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


@functools.lru_cache(maxsize=None)
def _make_block(h: int, w: int, interpret: bool, has_proj: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wp = w + 2
    nb = (h + 2) * wp
    band0 = wp + 1
    # band of exactly h*wp rows starting at padded row (1, 1): band index
    # b = (y-1)*wp + (x-1), so reshape(h, wp)[:, :w] IS the valid interior
    # (the extra per-row tail and the final 2 rows are garbage that the
    # slice drops) — no scatter needed anywhere.
    nband = h * wp
    pad_tail = band0 + nband + wp + 1 - nb  # tap slices may run past nb

    def kernel(*refs):
        if has_proj:
            (x_ref, wa, sa, ba, wb, sb, bb, wc, sc, bc,
             wpj, spj, bpj, o_ref) = refs
        else:
            x_ref, wa, sa, ba, wb, sb, bb, wc, sc, bc, o_ref = refs
        x = x_ref[0]                          # (H, W, Ci)
        ci = x.shape[-1]
        xf = x.reshape(h * w, ci)
        # conv_a 1x1 + BN + ReLU
        a = jax.lax.dot_general(
            xf, wa[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        a = jnp.maximum(a * sa[...] + ba[...], 0)
        cm = a.shape[-1]
        # pad to (H+2, W+2) and flatten rows
        am = a.reshape(h, w, cm)
        zcol = jnp.zeros((h, 1, cm), am.dtype)
        am = jnp.concatenate([zcol, am, zcol], axis=1)
        zrow = jnp.zeros((1, wp, cm), am.dtype)
        am = jnp.concatenate([zrow, am, zrow], axis=0)
        af = am.reshape(nb, cm)
        if pad_tail > 0:
            af = jnp.concatenate(
                [af, jnp.zeros((pad_tail, cm), af.dtype)], axis=0)
        # conv_b 3x3 over the interior band: contiguous row-slice taps
        bacc = jnp.zeros((nband, cm), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                off = (dy - 1) * wp + (dx - 1)
                s = band0 + off
                bacc += jax.lax.dot_general(
                    af[s:s + nband], wb[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        bb16 = jnp.maximum(bacc.astype(jnp.bfloat16) * sb[...] + bb[...], 0)
        # conv_c 1x1 + BN
        c = jax.lax.dot_general(
            bb16, wc[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        co = c.shape[-1]
        c = c * sc[...] + bc[...]
        # band rows (y-1)*wp + (x-1): the valid interior is a plain slice
        cgrid = c.reshape(h, wp, co)[:, :w]
        # residual + ReLU
        if has_proj:
            r = jax.lax.dot_general(
                xf, wpj[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            r = (r * spj[...] + bpj[...]).reshape(h, w, co)
        else:
            r = x
        o_ref[0] = jnp.maximum(cgrid + r, 0)

    def call(x, wa, sa, ba, wb, sb, bb, wc, sc, bc, proj=None):
        n, hh, ww, ci = x.shape
        cm = wa.shape[1]
        co = wc.shape[1]
        row = lambda i: (i, 0, 0, 0)     # noqa: E731
        const2 = lambda i: (0, 0)        # noqa: E731
        const4 = lambda i: (0, 0, 0, 0)  # noqa: E731
        vec = lambda i: (0, 0)           # noqa: E731
        in_specs = [
            pl.BlockSpec((1, hh, ww, ci), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, cm), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cm, cm), const4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((cm, co), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), vec, memory_space=pltpu.VMEM),
        ]
        args = [x, wa, sa, ba, wb, sb, bb, wc, sc, bc]
        if proj is not None:
            wpj, spj, bpj = proj
            in_specs += [
                pl.BlockSpec((ci, co), const2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co), vec, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co), vec, memory_space=pltpu.VMEM),
            ]
            args += [wpj, spj, bpj]
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hh, ww, co), row,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, hh, ww, co), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * hh * ww * (ci * cm + 9 * cm * cm + cm * co
                                         + (ci * co if proj else 0)),
                bytes_accessed=2 * n * hh * ww * (ci + co),
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)

    return call


def fused_bottleneck(x, wa, sa, ba, wb, sb, bb, wc, sc, bc, proj=None,
                     interpret=False):
    """x: (N, H, W, Ci) bf16 frames (T folded into N).  Weights: wa (Ci,Cm),
    wb (3,3,Cm,Cm), wc (Cm,Co); s*/b* folded-BN bf16 (C,) vectors.
    proj: optional (wproj (Ci,Co), sproj, bproj)."""
    h, w = x.shape[1:3]
    vecs = lambda v: v.reshape(1, -1)  # noqa: E731
    pr = None if proj is None else (proj[0], vecs(proj[1]), vecs(proj[2]))
    return _make_block(h, w, bool(interpret), pr is not None)(
        x, wa, vecs(sa), vecs(ba), wb, vecs(sb), vecs(bb), wc, vecs(sc),
        vecs(bc), pr)


def _xla_reference(x, wa, sa, ba, wb, sb, bb, wc, sc, bc, proj=None):
    """Op-by-op XLA formulation matching backbone.Bottleneck3D numerics."""
    import jax
    import jax.numpy as jnp

    def conv2d(t, k):
        return jax.lax.conv_general_dilated(
            t, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    a = jnp.maximum((x @ wa) * sa + ba, 0)
    b = conv2d(a, wb)
    b = jnp.maximum(b * sb + bb, 0)
    c = (b @ wc) * sc + bc
    if proj is not None:
        wpj, spj, bpj = proj
        r = (x @ wpj) * spj + bpj
    else:
        r = x
    return jnp.maximum(c + r, 0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    interpret = os.environ.get("PROTO_INTERPRET", "0") == "1"
    # res_2 dims at b8*16 frames for the timing run (scale printed per-GB)
    n = int(os.environ.get("PROTO_N", "256"))
    h = w = 56
    ci, cm, co = 256, 64, 256
    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.bfloat16)  # noqa: E731
    x = f(n, h, w, ci)
    wa, wb, wc = f(ci, cm), f(3, 3, cm, cm), f(cm, co)
    sa, ba = f(cm), f(cm)
    sb, bb = f(cm), f(cm)
    sc, bc = f(co), f(co)

    args = (x, wa, sa, ba, wb, sb, bb, wc, sc, bc)
    got = np.asarray(fused_bottleneck(*args, interpret=interpret),
                     np.float32)
    want = np.asarray(jax.jit(_xla_reference)(*args), np.float32)
    err = np.abs(got - want).max()
    rel = err / max(np.abs(want).max(), 1e-6)
    print(f"numerics: max abs {err:.4f}  rel {rel:.2e}")
    assert rel < 2e-2, "numerics mismatch"

    # with projection
    pr = (f(ci, co), f(co), f(co))
    got = np.asarray(fused_bottleneck(*args, proj=pr, interpret=interpret),
                     np.float32)
    want = np.asarray(jax.jit(lambda *a: _xla_reference(*a, proj=pr))(*args),
                      np.float32)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    print(f"numerics (proj): rel {err:.2e}")
    assert err < 2e-2

    if interpret:
        return

    # timing: enqueue-N, fetch one scalar
    fused = jax.jit(lambda *a: jnp.sum(
        fused_bottleneck(*a).astype(jnp.float32)))
    ref = jax.jit(lambda *a: jnp.sum(
        _xla_reference(*a).astype(jnp.float32)))
    for name, fn in (("fused", fused), ("xla", ref)):
        float(fn(*args))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(10)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / 10
        gb = 2 * n * h * w * (ci + co) * 2 / 1e9
        print(f"{name:6s} {dt * 1e3:8.2f} ms  ({gb / dt:.0f} GB/s eff)")


if __name__ == "__main__":
    main()
