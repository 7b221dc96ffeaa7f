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

NORM_STATS: Dict[str, Tuple[Tuple[float, ...], Tuple[float, ...]]] = {
    # data_transforms.py:17-33
    "slow_r50": ((0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
    "slowfast_r50": ((0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
    "slowfast_r101": ((0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
    "resnext101": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "mvit_B": ((0.45, 0.45, 0.45), (0.225, 0.225, 0.225)),
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


def op_shear_x(x, v):
    return _affine_warp(x, jnp.asarray([[1.0, v, 0.0], [0.0, 1.0, 0.0]]))


def op_shear_y(x, v):
    return _affine_warp(x, jnp.asarray([[1.0, 0.0, 0.0], [v, 1.0, 0.0]]))


def op_translate_x(x, v):
    px = v * x.shape[2]
    return _affine_warp(x, jnp.asarray([[1.0, 0.0, px], [0.0, 1.0, 0.0]]))


def op_translate_y(x, v):
    py = v * x.shape[1]
    return _affine_warp(x, jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, py]]))


def op_rotate(x, v):
    rad = v * jnp.pi / 180.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    return _affine_warp(
        x, jnp.asarray([[cos, sin, 0.0], [-sin, cos, 0.0]]))


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
