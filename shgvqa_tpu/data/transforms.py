"""On-device clip preprocessing + RandAugment (pure JAX, jit-able).

The reference preprocesses per item on CPU workers with torchvision/
pytorchvideo (``data_transforms.py:63-134``): permute -> uniform temporal
subsample -> resize 224 -> /255 -> normalize (-> RandAugment/AugMix for the
aug variants).  Here the whole stage is a fused XLA computation that runs on
batched uint8 frames in HBM — the host only decodes PNGs.

Divergence (documented): the reference applies RandAugment AFTER
normalization (``data_transforms.py:104-115``), which runs color ops on
z-scored values; we augment in [0,1] space and then normalize — the standard
order — because several ops (posterize/solarize/equalize) are only defined on
intensities.  Augmentation is stochastic so parity is distributional either
way.

RandAugment: num_layers=2 ops per clip, magnitude 9/31, applied with prob 0.5
per layer (pytorchvideo defaults), one op sample shared across the clip's
frames (video-consistent augmentation).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NORM_STATS: Dict[str, Tuple[Tuple[float, ...], Tuple[float, ...]]] = {
    # data_transforms.py:17-33
    "slow_r50": ((0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
    "slowfast_r50": ((0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
    "slowfast_r101": ((0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
    "resnext101": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "mvit_B": ((0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
    # beyond-reference implemented Swin trunk: ImageNet stats (official
    # Video-Swin kinetics pipeline)
    "video_swin_impl": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
}


def uniform_temporal_subsample(frames: jnp.ndarray, num_samples: int
                               ) -> jnp.ndarray:
    """(T0, ...) -> (num_samples, ...) nearest-neighbor linspace gather."""
    t = frames.shape[0]
    idx = jnp.clip(
        jnp.linspace(0.0, float(t - 1), num_samples), 0, t - 1
    ).astype(jnp.int32)
    return frames[idx]


def resize_clip(frames: jnp.ndarray, size: int) -> jnp.ndarray:
    """(T, H, W, C) -> (T, size, size, C) bilinear."""
    t, _, _, c = frames.shape
    return jax.image.resize(frames, (t, size, size, c), method="bilinear")


def normalize_clip(frames01: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, frames01.dtype)
    std = jnp.asarray(std, frames01.dtype)
    return (frames01 - mean) / std


@partial(jax.jit, static_argnames=("clip_len", "size", "backbone"))
def preprocess_clip(frames_uint8: jnp.ndarray, clip_len: int, size: int,
                    backbone: str = "slow_r50") -> jnp.ndarray:
    """no_aug pipeline: (T0, H0, W0, 3) uint8 -> (clip_len, size, size, 3)
    normalized f32."""
    mean, std = NORM_STATS[backbone]
    x = uniform_temporal_subsample(frames_uint8, clip_len)
    x = x.astype(jnp.float32)
    x = resize_clip(x, size)
    x = x / 255.0
    return normalize_clip(x, mean, std)


# ---------------------------------------------------------------------------
# RandAugment ops.  All operate on (T, H, W, C) float in [0, 1].
# ---------------------------------------------------------------------------

def _blend(a: jnp.ndarray, b: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


def _gray(x: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    g = jnp.tensordot(x, w, axes=[[-1], [0]])
    return g[..., None] * jnp.ones_like(x)


def op_brightness(x, v):
    return _blend(x, jnp.zeros_like(x), 1.0 + v)


def op_contrast(x, v):
    mean = jnp.mean(_gray(x), axis=(-3, -2, -1), keepdims=True)
    return _blend(x, mean * jnp.ones_like(x), 1.0 + v)


def op_color(x, v):
    return _blend(x, _gray(x), 1.0 + v)


def op_sharpness(x, v):
    # 3x3 smoothing kernel [[1,1,1],[1,5,1],[1,1,1]]/13 per channel
    k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], x.dtype) / 13.0
    t, h, w, c = x.shape
    xt = x.transpose(0, 3, 1, 2).reshape(t * c, 1, h, w)
    blurred = jax.lax.conv_general_dilated(
        xt, k[None, None], window_strides=(1, 1), padding="SAME",
    ).reshape(t, c, h, w).transpose(0, 2, 3, 1)
    # torchvision keeps the border unsharpened
    border = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    blurred = jnp.where(border[None, :, :, None], blurred, x)
    return _blend(x, blurred, 1.0 + v)


def op_posterize(x, v):
    bits = jnp.clip(8 - v.astype(jnp.int32), 1, 8)
    levels = (2.0 ** bits).astype(x.dtype)
    q = jnp.floor(x * 255.0).astype(jnp.int32)
    shift = 8 - bits
    q = (q >> shift) << shift
    return q.astype(x.dtype) / 255.0


def op_solarize(x, v):
    thresh = 1.0 - v
    return jnp.where(x >= thresh, 1.0 - x, x)


def op_autocontrast(x, _v):
    lo = jnp.min(x, axis=(-3, -2), keepdims=True)
    hi = jnp.max(x, axis=(-3, -2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    off = jnp.where(hi > lo, lo, 0.0)
    return jnp.clip((x - off) * scale, 0.0, 1.0)


def op_equalize(x, _v):
    """Per-channel histogram equalization over the whole clip (256 bins)."""
    t, h, w, c = x.shape
    q = jnp.clip(jnp.floor(x * 255.0), 0, 255).astype(jnp.int32)

    def eq_channel(ch):  # (T, H, W) int
        flat = ch.reshape(-1)
        hist = jnp.zeros((256,), jnp.float32).at[flat].add(1.0)
        cdf = jnp.cumsum(hist)
        # torchvision-style: step = (total - last_nonzero_count) / 255
        nz_min = jnp.min(jnp.where(hist > 0, cdf, jnp.inf))
        total = cdf[-1]
        denom = jnp.maximum(total - nz_min, 1.0)
        lut = jnp.clip(
            jnp.round((cdf - nz_min) / denom * 255.0), 0, 255
        )
        return lut[flat].reshape(ch.shape)

    out = jnp.stack(
        [eq_channel(q[..., i]) for i in range(c)], axis=-1
    )
    return out.astype(x.dtype) / 255.0


def _affine_warp(x: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Apply a 2x3 inverse affine map (about the image center) to each frame
    with bilinear sampling, zero fill."""
    t, h, w, c = x.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = yy - cy, xx - cx
    src_x = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2] + cx
    src_y = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2] + cy
    coords = jnp.stack([src_y, src_x])  # (2, H, W)

    def warp_frame_channel(img2d):
        return jax.scipy.ndimage.map_coordinates(
            img2d, coords, order=1, mode="constant", cval=0.0
        )

    flat = x.transpose(0, 3, 1, 2).reshape(t * c, h, w)
    warped = jax.vmap(warp_frame_channel)(flat)
    return warped.reshape(t, c, h, w).transpose(0, 2, 3, 1)


# Geometric ops run as 1-D "row shear" passes instead of a 2-D gather.
# A shear/translate's inverse map keeps one coordinate integral, so a 1-D
# lerp along the other axis IS the exact bilinear result; rotation uses the
# Paeth 3-shear decomposition R = X(tan(t/2)) Y(-sin t) X(tan(t/2)) — a
# deliberate, documented divergence from 2-D bilinear rotation (three 1-D
# lerps; tests bound the difference).  Why: a general 2-D warp is a
# per-pixel 4-tap gather — 77M lane-hostile lookups per b32 batch, measured
# 370-400 ms/layer on-chip no matter the layout — while a row shear is R
# coalesced (1, C+1, T*C) slice-gathers + one lerp (the TPU loves it).

_GEO_PAD = 128   # covers max |shift| at magnitude 31: translate 0.45*224=101


def _row_shear(planes: jnp.ndarray, shift: jnp.ndarray,
               pad: int = _GEO_PAD) -> jnp.ndarray:
    """planes (R, C, L) -> out[r, c] = planes[r, c + shift[r]] with 1-D
    bilinear along C and zero fill.  ``pad`` must exceed max |shift| (the
    gather clamps out-of-range starts, which would silently repeat border
    rows) — callers with a static magnitude bound pass a tight value, since
    the default doubles the pass's HBM traffic (224 -> 481 columns)."""
    r, c, l = planes.shape
    xp = jnp.pad(planes, ((0, 0), (pad, pad + 1), (0, 0)))
    k = jnp.floor(shift).astype(jnp.int32)
    f = (shift - k.astype(shift.dtype))[:, None, None].astype(planes.dtype)
    starts = jnp.stack(
        [jnp.arange(r, dtype=jnp.int32), k + pad], axis=-1)
    g = jax.lax.gather(
        xp, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1)),
        slice_sizes=(1, c + 1, l),
    )                                                      # (R, C+1, L)
    return (1.0 - f) * g[:, :c] + f * g[:, 1:]


def _geo_passes(x: jnp.ndarray, lam1=0.0, beta=0.0, lam3=0.0,
                t1=0.0, t2=0.0, pad: int = _GEO_PAD) -> jnp.ndarray:
    """x (T, H, W, C): x-shear(lam1)+translate(t1) -> y-shear(beta)+
    translate(t2) -> x-shear(lam3), each about the image center."""
    t, h, w, c = x.shape
    planes = x.transpose(1, 2, 0, 3).reshape(h, w, t * c)
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    planes = _row_shear(planes, lam1 * ys + t1, pad=pad)
    pt = planes.transpose(1, 0, 2)                         # (W, H, TC)
    pt = _row_shear(pt, beta * xs + t2, pad=pad)
    planes = pt.transpose(1, 0, 2)
    planes = _row_shear(planes, lam3 * ys + jnp.zeros_like(ys), pad=pad)
    return planes.reshape(h, w, t, c).transpose(2, 0, 1, 3)


def _geo_pad_bound(magnitude: int, h: int, w: int) -> int:
    """Tight static bound on |shift| for any RandAugment geometry op at the
    given magnitude: rotate contributes tan(rad/2)/sin(rad) shears, shear
    0.3*m/31, translate 0.45*m/31 * dim (``RAND_AUGMENT_OPS`` maxvals)."""
    m = magnitude / 31.0
    dim = max(h, w)
    rad = np.radians(30.0 * m)
    shear = max(np.tan(rad / 2.0), np.sin(rad), 0.3 * m) * (dim - 1) / 2.0
    translate = 0.45 * m * dim
    return min(_GEO_PAD, int(np.ceil(max(shear, translate))) + 2)


def op_shear_x(x, v):
    return _geo_passes(x, lam1=v)


def op_shear_y(x, v):
    return _geo_passes(x, beta=v)


def op_translate_x(x, v):
    return _geo_passes(x, t1=v * x.shape[2])


def op_translate_y(x, v):
    return _geo_passes(x, t2=v * x.shape[1])


def op_rotate(x, v):
    rad = v * jnp.pi / 180.0
    a = jnp.tan(rad / 2.0)
    return _geo_passes(x, lam1=a, beta=-jnp.sin(rad), lam3=a)


def op_identity(x, _v):
    return x


# (fn, max_magnitude_value, signed)
RAND_AUGMENT_OPS = (
    (op_identity, 0.0, False),
    (op_autocontrast, 0.0, False),
    (op_equalize, 0.0, False),
    (op_rotate, 30.0, True),
    (op_solarize, 1.0, False),
    (op_color, 0.9, True),
    (op_posterize, 4.0, False),
    (op_contrast, 0.9, True),
    (op_brightness, 0.9, True),
    (op_sharpness, 0.9, True),
    (op_shear_x, 0.3, True),
    (op_shear_y, 0.3, True),
    (op_translate_x, 0.45, True),
    (op_translate_y, 0.45, True),
)


def aug_mix(frames01: jnp.ndarray, rng: jax.Array, severity: int = 3,
            width: int = 3, depth: int = 2, alpha: float = 1.0
            ) -> jnp.ndarray:
    """AugMix (Hendrycks et al.): ``width`` augmentation chains mixed with
    Dirichlet(alpha) weights, then Beta(alpha, alpha)-blended with the clean
    clip.  Chains use the RandAugment op set at ``severity``; depth fixed
    (the paper samples 1-3; a fixed 2 keeps the trace static)."""
    rng, r_w, r_m = jax.random.split(rng, 3)
    ws = jax.random.dirichlet(r_w, jnp.full((width,), alpha))
    m = jax.random.beta(r_m, alpha, alpha)
    mixed = jnp.zeros_like(frames01)
    for i in range(width):
        rng, r_chain = jax.random.split(rng)
        chain = rand_augment(frames01, r_chain, num_layers=depth,
                             magnitude=severity, prob=1.0)
        mixed = mixed + ws[i].astype(frames01.dtype) * chain
    return (1.0 - m).astype(frames01.dtype) * frames01 +         m.astype(frames01.dtype) * mixed


def rand_augment(frames01: jnp.ndarray, rng: jax.Array,
                 num_layers: int = 2, magnitude: int = 9,
                 prob: float = 0.5) -> jnp.ndarray:
    """Video-consistent RandAugment: per layer sample one op (uniform), apply
    with probability ``prob`` at magnitude/31-scaled strength, random sign for
    signed ops."""
    x = frames01
    n_ops = len(RAND_AUGMENT_OPS)
    for layer in range(num_layers):
        rng, r_op, r_apply, r_sign = jax.random.split(rng, 4)
        op_idx = jax.random.randint(r_op, (), 0, n_ops)
        apply = jax.random.uniform(r_apply) < prob
        sign = jnp.where(jax.random.uniform(r_sign) < 0.5, -1.0, 1.0)

        def branch(i):
            fn, maxval, signed = RAND_AUGMENT_OPS[i]
            level = (magnitude / 31.0) * maxval
            def run(y):
                v = jnp.asarray(level, y.dtype)
                v = v * sign if signed else v
                return fn(y, v)
            return run

        augmented = jax.lax.switch(
            op_idx, [branch(i) for i in range(n_ops)], x
        )
        x = jnp.where(apply, augmented, x)
    return x


# ---------------------------------------------------------------------------
# Batched RandAugment.
#
# ``jax.vmap(rand_augment)`` is correct but catastrophic on TPU: vmap lowers
# the per-clip ``lax.switch`` to "execute EVERY branch on the whole batch and
# select", so each of the 2 layers runs all 14 ops — including 5 gather-heavy
# affine warps and the scatter-add histogram equalize — on (B,T,224,224,3).
# Measured on-chip at b32: 6.6 s per batch (tools/bench_ladder.py, round 2),
# which would cap the published rand_aug training recipes
# (``README.md:51,162-186`` of the reference) at ~5 clips/s.
#
# The batched formulation samples per-clip (op, apply, sign) with the exact
# split sequence of ``rand_augment`` (bit-identical draws), then executes
# each op ONCE per layer on the whole batch:
#   - the 5 geometric ops collapse into ONE warp with a per-clip affine
#     matrix (identity for clips whose op is photometric);
#   - photometric ops are cheap elementwise/reduction passes XLA fuses;
#   - equalize builds its 256-bin histogram as a nibble-factored MXU gram
#     matmul and applies the LUT in two 16-wide contraction stages (see
#     ``op_equalize_batch``) on an optionally strided pixel subsample
#     (stride 1 == exact; the default 8 estimates the histogram from ~100k
#     pixels/channel, a documented divergence on an already-stochastic op).
# ---------------------------------------------------------------------------

_GEO_ROT, _GEO_SHX, _GEO_SHY, _GEO_TRX, _GEO_TRY = 3, 10, 11, 12, 13
_OP_EQUALIZE, _OP_SHARPNESS = 2, 9


def _sample_rand_augment(key: jax.Array, num_layers: int, prob: float):
    """Replicates rand_augment's per-layer split sequence for one clip."""
    ops, applies, signs = [], [], []
    n_ops = len(RAND_AUGMENT_OPS)
    for _ in range(num_layers):
        key, r_op, r_apply, r_sign = jax.random.split(key, 4)
        ops.append(jax.random.randint(r_op, (), 0, n_ops))
        applies.append(jax.random.uniform(r_apply) < prob)
        signs.append(
            jnp.where(jax.random.uniform(r_sign) < 0.5, -1.0, 1.0))
    return jnp.stack(ops), jnp.stack(applies), jnp.stack(signs)


def op_equalize_batch(x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """(B, T, H, W, C) batched equalize, scatter- and gather-free.

    Nibble-factored formulation (tools/proto_equalize.py A/B: 182 -> 34 ms
    at b64 on-chip vs the earlier sort+searchsorted CDF + 256-wide one-hot
    apply, bit-identical output):

    - histogram: ``hist2[hi, lo] = sum_p 1[q>>4 == hi] * 1[q&15 == lo]`` as
      a bf16 gram einsum contracting over PIXELS — a true MXU matmul
      (K ~ 100k, M = N = 16); counts accumulate exactly in f32 (< 2^24).
      cdf = cumsum of the flattened 256 bins.
    - apply: ``out = sum_hi 1[hi] * (sum_lo 1[lo] * lut2[hi, lo])`` — the
      inner contraction is a (P, 16) x (16, 16) dot, so the LUT lookup is
      two 16-wide stages instead of one 256-wide select-reduce (which XLA
      lowered to 256 compare+select+adds per pixel on the VPU).  One-hot
      and integer LUT values (<= 255) are exact in bf16.

    The LUT formula matches ``op_equalize`` exactly, so stride=1 is
    bit-equal to the per-clip op; the default driver stride estimates the
    histogram from a pixel subsample (documented divergence on an already-
    stochastic op)."""
    b, t, h, w, c = x.shape
    q = jnp.clip(jnp.floor(x * 255.0), 0, 255).astype(jnp.int32)
    qc = q.transpose(0, 4, 1, 2, 3).reshape(b, c, -1)          # (B, C, P)
    # histogram subsample: every stride-th H-row (full W rows stay lane-
    # contiguous) instead of every stride-th flat pixel — the flat form
    # lowered as a lane-hostile strided s32 transpose (6.3 ms/layer at
    # sub-batch cap 10, round-3 profile); same ~P/stride pixels/channel
    sub_q = q if stride == 1 else q[:, :, ::stride]
    sub = sub_q.transpose(0, 4, 1, 2, 3).reshape(b, c, -1)
    nib = jnp.arange(16, dtype=jnp.int32)
    hi = ((sub >> 4)[..., None] == nib).astype(jnp.bfloat16)
    lo = ((sub & 15)[..., None] == nib).astype(jnp.bfloat16)
    hist = jnp.einsum("bcph,bcpl->bchl", hi, lo,
                      preferred_element_type=jnp.float32,
                      ).reshape(b, c, 256)                     # (B, C, 256)
    cdf = jnp.cumsum(hist, axis=-1)
    nz_min = jnp.min(jnp.where(hist > 0, cdf, jnp.inf), axis=-1,
                     keepdims=True)
    total = cdf[..., -1:]
    denom = jnp.maximum(total - nz_min, 1.0)
    lut = jnp.clip(jnp.round((cdf - nz_min) / denom * 255.0), 0, 255)
    lut2 = lut.reshape(b, c, 16, 16).astype(jnp.bfloat16)      # [hi, lo]
    ohl = ((qc & 15)[..., None] == nib).astype(jnp.bfloat16)   # (B, C, P, 16)
    tmp = jnp.einsum("bcpl,bchl->bcph", ohl, lut2,
                     preferred_element_type=jnp.bfloat16)      # (B, C, P, 16)
    ohh = (qc >> 4)[..., None] == nib
    out = jnp.sum(jnp.where(ohh, tmp, jnp.bfloat16(0)),
                  axis=-1).astype(jnp.float32)                 # (B, C, P)
    out = out.reshape(b, c, t, h, w).transpose(0, 2, 3, 4, 1)
    return out.astype(x.dtype) / 255.0


def _class_cap(b: int, p_class: float, sigmas: float = 3.0) -> int:
    """Static sub-batch capacity for one augmentation op class: the mean +
    ``sigmas``-sigma tail of the Binomial(b, p_class) per-layer count.
    Overflow (~1e-3/layer at 3 sigma) routes through the caller's lax.cond
    to the full-batch path — results stay EXACT on every step, and the
    rare full-batch layer (~+60 ms once per ~500 steps) amortizes to
    ~0.1 ms/step, so a tight capacity is strictly better than a safe one."""
    mean = b * p_class
    sd = (b * p_class * (1.0 - p_class)) ** 0.5
    return min(b, int(np.ceil(mean + sigmas * sd)) + 1)


def _apply_layer_batch(x: jnp.ndarray, op: jnp.ndarray, apply: jnp.ndarray,
                       sign: jnp.ndarray, magnitude: int,
                       eq_stride: int, apply_prob: float = 1.0,
                       subbatch: bool = True) -> jnp.ndarray:
    """One RandAugment layer over the batch.

    Full-batch path: every op class executes once on the WHOLE batch and a
    select tree picks each clip's result — trace-static but wasteful: only
    ~B*prob/14 clips need each op, yet the expensive classes (the 5
    geometric ops' shear pipeline ~90 ms, equalize ~50 ms, sharpness ~8 ms
    per b64 step, round-3 profile) stream all B clips.

    Sub-batch path (``subbatch=True``, the default): clips assigned to each
    heavy class are gathered into a fixed-capacity sub-batch
    (:func:`_class_cap`), the op runs there, and the results scatter back.
    A ``lax.cond`` routes the (rare) capacity overflow to the full-batch
    path, so the output is bit-identical to the full path — and therefore
    to ``vmap(rand_augment)`` — on every step.  The geometry family is
    further split into its three shear passes (x-shear+translate,
    y-shear+translate, final x-shear), each with its own sub-batch: only
    rotate needs all three, so shear/translate clips pay one pass instead
    of three (identity shears are bit-exact no-ops, so the split equals the
    composed form).  Pure elementwise ops (solarize/color/posterize/
    brightness) stay full-batch: XLA fuses them into ~2 passes, and a
    gather/scatter per class would cost more than it saves."""
    b, t, h, w, c = x.shape
    op = jnp.where(apply, op, 0)                  # identity when not applied

    def lvl(i):
        _, maxval, signed = RAND_AUGMENT_OPS[i]
        v = (magnitude / 31.0) * maxval
        return (v * sign if signed else jnp.full_like(sign, v)).astype(
            x.dtype)

    def sel(i, cand, out):
        return jnp.where((op == i)[:, None, None, None, None], cand, out)

    vx = lambda f, i: jax.vmap(f)(x, lvl(i))      # noqa: E731

    def photometric(x, full):
        out = x                                    # 0: identity
        if full:                # reduction-bearing ops gathered otherwise
            out = sel(1, jax.vmap(op_autocontrast)(x, lvl(1)), out)
            out = sel(7, vx(op_contrast, 7), out)
        out = sel(4, vx(op_solarize, 4), out)
        out = sel(5, vx(op_color, 5), out)
        out = sel(6, vx(op_posterize, 6), out)
        out = sel(8, vx(op_brightness, 8), out)
        return out

    is_geo = ((op == _GEO_ROT) | (op >= _GEO_SHX))
    is_eq = op == _OP_EQUALIZE
    is_sharp = op == _OP_SHARPNESS
    zero = jnp.zeros_like(sign)
    rad = lvl(_GEO_ROT).astype(jnp.float32) * jnp.pi / 180.0
    a = jnp.tan(rad / 2.0)
    lam1 = jnp.where(op == _GEO_ROT, a,
                     jnp.where(op == _GEO_SHX, lvl(_GEO_SHX), zero))
    beta = jnp.where(op == _GEO_ROT, -jnp.sin(rad),
                     jnp.where(op == _GEO_SHY, lvl(_GEO_SHY), zero))
    lam3 = jnp.where(op == _GEO_ROT, a, zero)
    t1 = jnp.where(op == _GEO_TRX, lvl(_GEO_TRX) * w, zero)
    t2 = jnp.where(op == _GEO_TRY, lvl(_GEO_TRY) * h, zero)
    pad = _geo_pad_bound(magnitude, h, w)
    geo_fn = jax.vmap(partial(_geo_passes, pad=pad))

    def full_path(x):
        out = photometric(x, full=True)
        out = sel(_OP_EQUALIZE, op_equalize_batch(x, stride=eq_stride), out)
        out = sel(_OP_SHARPNESS, vx(op_sharpness, _OP_SHARPNESS), out)
        warped = geo_fn(x, lam1, beta, lam3, t1, t2)
        return jnp.where(is_geo[:, None, None, None, None], warped, out)

    # per-pass geometry masks: rotate composes all three shear passes;
    # shear/translate clips need exactly one (identity shears are bit-exact
    # no-ops, so running only the needed pass equals _geo_passes)
    is_x1 = (op == _GEO_ROT) | (op == _GEO_SHX) | (op == _GEO_TRX)
    is_y = (op == _GEO_ROT) | (op == _GEO_SHY) | (op == _GEO_TRY)
    is_rot = op == _GEO_ROT
    is_autoc = op == 1
    is_contrast = op == 7
    cap_g3 = _class_cap(b, apply_prob * 3.0 / 14.0)
    cap_one = _class_cap(b, apply_prob / 14.0)
    if not subbatch or (cap_g3 >= b and cap_one >= b):
        return full_path(x)                        # tiny batches: no win

    ys_h = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs_w = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0

    def shear_x_one(xc, shift):
        planes = xc.transpose(1, 2, 0, 3).reshape(h, w, t * c)
        p2 = _row_shear(planes, shift, pad=pad)
        return p2.reshape(h, w, t, c).transpose(2, 0, 1, 3)

    def shear_y_one(xc, shift):
        planes = xc.transpose(2, 1, 0, 3).reshape(w, h, t * c)
        p2 = _row_shear(planes, shift, pad=pad)
        return p2.reshape(w, h, t, c).transpose(2, 1, 0, 3)

    def gathered_path(x):
        out = photometric(x, full=False)

        def run_sub(mask, cap, fn, out):
            # real rows first (argsort of the negated mask), padded with
            # whatever clips follow; padding rows scatter back out[idx]
            # unchanged (the select tree / earlier passes may have touched
            # them).  op inputs gather from OUT, not x: disjoint op classes
            # leave each other's rows untouched, and the sequential geo
            # passes must chain (rotate = x-shear o y-shear o x-shear).
            idx = jnp.argsort(jnp.logical_not(mask))[:cap]
            keep = mask[idx][:, None, None, None, None]
            sub = out[idx]
            y = fn(sub, idx)
            return out.at[idx].set(jnp.where(keep, y, sub))

        out = run_sub(
            is_autoc, cap_one,
            lambda s, i: jax.vmap(op_autocontrast)(s, lvl(1)[i]), out)
        out = run_sub(
            is_contrast, cap_one,
            lambda s, i: jax.vmap(op_contrast)(s, lvl(7)[i]), out)
        out = run_sub(
            is_eq, cap_one,
            lambda s, i: op_equalize_batch(s, stride=eq_stride), out)
        out = run_sub(
            is_sharp, cap_one,
            lambda s, i: jax.vmap(op_sharpness)(
                s, lvl(_OP_SHARPNESS)[i]), out)
        out = run_sub(
            is_x1, cap_g3,
            lambda s, i: jax.vmap(shear_x_one)(
                s, lam1[i, None] * ys_h[None] + t1[i, None]), out)
        out = run_sub(
            is_y, cap_g3,
            lambda s, i: jax.vmap(shear_y_one)(
                s, beta[i, None] * xs_w[None] + t2[i, None]), out)
        out = run_sub(
            is_rot, cap_one,
            lambda s, i: jax.vmap(shear_x_one)(
                s, lam3[i, None] * ys_h[None]), out)
        return out

    overflow = ((jnp.sum(is_x1) > cap_g3) | (jnp.sum(is_y) > cap_g3)
                | (jnp.sum(is_rot) > cap_one) | (jnp.sum(is_eq) > cap_one)
                | (jnp.sum(is_sharp) > cap_one)
                | (jnp.sum(is_autoc) > cap_one)
                | (jnp.sum(is_contrast) > cap_one))
    return jax.lax.cond(overflow, full_path, gathered_path, x)


def rand_augment_batch(frames01: jnp.ndarray, keys: jax.Array,
                       num_layers: int = 2, magnitude: int = 9,
                       prob: float = 0.5, eq_stride: int = 8,
                       subbatch: bool = True) -> jnp.ndarray:
    """Batched video-consistent RandAugment: (B, T, H, W, C) in [0, 1] with
    per-clip keys (B, ...).  Samples identically to
    ``vmap(rand_augment)(frames, keys)``; with eq_stride=1 the output is
    bit-equal (tests/test_transforms.py).  ``subbatch`` gathers the heavy
    op classes into fixed-capacity sub-batches (see _apply_layer_batch) —
    exact, and much cheaper at training batch sizes."""
    op, apply, sign = jax.vmap(
        lambda k: _sample_rand_augment(k, num_layers, prob))(keys)
    x = frames01
    for layer in range(num_layers):
        x = _apply_layer_batch(x, op[:, layer], apply[:, layer],
                               sign[:, layer], magnitude, eq_stride,
                               apply_prob=prob, subbatch=subbatch)
    return x


def aug_mix_batch(frames01: jnp.ndarray, keys: jax.Array, severity: int = 3,
                  width: int = 3, depth: int = 2, alpha: float = 1.0,
                  eq_stride: int = 8, subbatch: bool = True,
                  fold_chains: bool = True) -> jnp.ndarray:
    """Batched AugMix with the same per-clip sampling as ``aug_mix``.

    ``fold_chains`` (default) runs the ``width`` augmentation chains as ONE
    ``rand_augment_batch`` over a (width*B) folded batch instead of width
    sequential B-sized calls: ``width*depth`` layer passes collapse to
    ``depth``, and the fixed-capacity sub-batch gathers amortize better at
    width*B (the 3-sigma tail is relatively smaller, so fewer wasted
    gathered rows per real row).  Bit-identical to the unfolded form: each
    clip-chain keeps its own key and layer order, and the weighted chain
    accumulation below runs in the same i = 0..width-1 order."""
    def sample(key):
        key, r_w, r_m = jax.random.split(key, 3)
        ws = jax.random.dirichlet(r_w, jnp.full((width,), alpha))
        m = jax.random.beta(r_m, alpha, alpha)
        chain_keys = []
        for _ in range(width):
            key, r_chain = jax.random.split(key)
            chain_keys.append(r_chain)
        return ws, m, jnp.stack(chain_keys)

    ws, m, chain_keys = jax.vmap(sample)(keys)     # (B,W), (B,), (B,W,2)
    b = frames01.shape[0]
    if fold_chains:
        tiled = jnp.broadcast_to(
            frames01[None], (width,) + frames01.shape
        ).reshape((width * b,) + frames01.shape[1:])
        # folded row w*b + i carries chain w of clip i
        folded_keys = chain_keys.transpose(1, 0, 2).reshape(width * b, -1)
        chains = rand_augment_batch(tiled, folded_keys, num_layers=depth,
                                    magnitude=severity, prob=1.0,
                                    eq_stride=eq_stride, subbatch=subbatch)
        chains = chains.reshape((width, b) + frames01.shape[1:])
        mixed = jnp.zeros_like(frames01)
        for i in range(width):
            mixed = mixed + ws[:, i, None, None, None, None].astype(
                frames01.dtype) * chains[i]
    else:
        mixed = jnp.zeros_like(frames01)
        for i in range(width):
            chain = rand_augment_batch(frames01, chain_keys[:, i],
                                       num_layers=depth, magnitude=severity,
                                       prob=1.0, eq_stride=eq_stride,
                                       subbatch=subbatch)
            mixed = mixed + ws[:, i, None, None, None, None].astype(
                frames01.dtype) * chain
    mb = m[:, None, None, None, None].astype(frames01.dtype)
    return (1.0 - mb) * frames01 + mb * mixed


@partial(jax.jit, static_argnames=("clip_len", "size", "backbone",
                                   "augment_type"))
def preprocess_and_augment(frames_uint8: jnp.ndarray, rng: jax.Array,
                           clip_len: int, size: int,
                           backbone: str = "slow_r50",
                           augment_type: str = "rand_aug") -> jnp.ndarray:
    """Full augmented pipeline for one clip."""
    mean, std = NORM_STATS[backbone]
    x = uniform_temporal_subsample(frames_uint8, clip_len)
    x = resize_clip(x.astype(jnp.float32), size) / 255.0
    if augment_type in ("rand_aug", "rand_aug_slowfast"):
        x = rand_augment(x, rng)
    elif augment_type == "aug_mix":
        x = aug_mix(x, rng)
    return normalize_clip(x, mean, std)
