"""Video backbones (flax).

The reference constructs torch.hub pytorchvideo backbones with the
classification head replaced by Identity (``video_encoder.py:30-51``) and runs
them in eval mode inside the train loop (``agqaHGQA.py:263`` — BatchNorm uses
running stats; STAR additionally freezes the params, ``star.py:87-88``).

``SlowR50`` is a ground-up flax implementation of the slow-pathway 3D
ResNet-50 (SlowFast paper, slow-only): for a (B, 16, 224, 224, 3) clip it
produces (B, 16, 7, 7, 2048) features — the (B, 2048, 16, 7, 7) the reference
feeds its conv tokenizer, in TPU-friendly channels-last layout.

Architecture facts (matching pytorchvideo ``slow_r50``):
- stem: conv(1,7,7)/stride(1,2,2) -> BN -> ReLU -> maxpool(1,3,3)/s(1,2,2)
- 4 bottleneck stages, depths (3,4,6,3), widths (256,512,1024,2048)
- temporal kernel on the first 1x1 conv of each bottleneck: 1 in res2/res3,
  3 in res4/res5 (slow path has no temporal convs early, per the paper)
- spatial stride 2 at the entry block of res3/res4/res5 (on the 3x3 conv)
- no temporal striding anywhere: T is preserved.

BatchNorm always runs with running statistics (eval-mode), matching the
reference's usage; ``tools/convert_slow_r50.py`` ports torch weights.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm that ALWAYS uses stored running statistics (the reference
    backbone never leaves eval mode)."""

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,))).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,))).value
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + self.eps)
                          ).astype(self.dtype)


class _StemKernel(nn.Module):
    """Declares the stem conv kernel at the exact path nn.Conv would
    ("<name>/kernel", same shape + he_normal init => bit-identical draws),
    so the space-to-depth stem below keeps checkpoints and the weight
    converters byte-compatible with the plain-conv formulation."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.he_normal(), self.shape)


def space_to_depth_stem(x: jnp.ndarray, kernel: jnp.ndarray, dtype,
                        temporal_stride: int = 1) -> jnp.ndarray:
    """EXACT re-expression of the stem conv(kT,7,7)/stride(.,2,2)/pad(3,3)
    as a (kT,4,4)/stride(.,1,1) conv on 2x2 space-to-depth input (the
    MLPerf ResNet trick): with r = 2u+v, tap ky = 2*du+v-1 over 4 block
    rows at block padding (2,1).

    MEASURED SLOWER on this platform and therefore NOT wired into the
    backbones: at b32 the plain bf16 stem runs 9.3 ms vs 11.0 ms for this
    form (round 2 A/B) — current libtpu handles 3-input-channel convs well
    on its own, and the s2d transpose costs a full pass over the frames.
    Kept (with its exactness tests) as the documented fallback should a
    future platform regress on shallow-channel convs.

    x: (B, T, H, W, C) with H, W even; kernel: (kT, 7, 7, C, O).
    Returns (B, T', H/2, W/2, O), identical to the plain stem conv."""
    import jax

    b, t, h, w, c = x.shape
    kt = kernel.shape[0]
    x2 = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
    x2 = x2.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        b, t, h // 2, w // 2, 4 * c)
    kp = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    o = kernel.shape[-1]
    k2 = kp.reshape(kt, 4, 2, 4, 2, c, o).transpose(
        0, 1, 3, 2, 4, 5, 6).reshape(kt, 4, 4, 4 * c, o)
    return jax.lax.conv_general_dilated(
        x2.astype(dtype), k2.astype(dtype),
        window_strides=(temporal_stride, 1, 1),
        padding=((kt // 2, kt // 2), (2, 1), (2, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _conv(features: int, kernel: Tuple[int, int, int],
          strides: Tuple[int, int, int], dtype, name: str) -> nn.Conv:
    pad = tuple((k // 2, k // 2) for k in kernel)
    return nn.Conv(
        features, kernel_size=kernel, strides=strides, padding=pad,
        use_bias=False, dtype=dtype, param_dtype=jnp.float32,
        kernel_init=nn.initializers.he_normal(), name=name,
    )


class Bottleneck3D(nn.Module):
    mid: int
    out: int
    temporal_kernel: int = 1
    spatial_stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        tk = self.temporal_kernel
        ss = self.spatial_stride
        residual = x
        h = _conv(self.mid, (tk, 1, 1), (1, 1, 1), dt, "conv_a")(x)
        h = FrozenBatchNorm(self.mid, dtype=dt, name="bn_a")(h)
        h = nn.relu(h)
        h = _conv(self.mid, (1, 3, 3), (1, ss, ss), dt, "conv_b")(h)
        h = FrozenBatchNorm(self.mid, dtype=dt, name="bn_b")(h)
        h = nn.relu(h)
        h = _conv(self.out, (1, 1, 1), (1, 1, 1), dt, "conv_c")(h)
        h = FrozenBatchNorm(self.out, dtype=dt, name="bn_c")(h)
        if residual.shape[-1] != self.out or ss != 1:
            residual = _conv(self.out, (1, 1, 1), (1, ss, ss), dt,
                             "conv_proj")(residual)
            residual = FrozenBatchNorm(self.out, dtype=dt,
                                       name="bn_proj")(residual)
        return nn.relu(h + residual)


class ResStage(nn.Module):
    depth: int
    mid: int
    out: int
    temporal_kernel: int
    spatial_stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.depth):
            x = Bottleneck3D(
                mid=self.mid,
                out=self.out,
                temporal_kernel=self.temporal_kernel,
                spatial_stride=self.spatial_stride if i == 0 else 1,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x)
        return x


class SlowR50(nn.Module):
    """Slow-pathway 3D ResNet-50 feature extractor (head removed)."""

    dtype: Dtype = jnp.float32
    depths: Sequence[int] = (3, 4, 6, 3)
    temporal_kernels: Sequence[int] = (1, 1, 3, 3)
    # width overrides let tests run the exact topology at toy scale
    stem_width: int = 64
    mids: Sequence[int] = (64, 128, 256, 512)
    outs: Sequence[int] = (256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, H, W, 3) normalized frames -> (B, T, H/32, W/32, 2048)."""
        dt = self.dtype
        x = x.astype(dt)
        h = _conv(self.stem_width, (1, 7, 7), (1, 2, 2), dt, "stem_conv")(x)
        h = FrozenBatchNorm(self.stem_width, dtype=dt, name="stem_bn")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, window_shape=(1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        mids = self.mids
        outs = self.outs
        strides = (1, 2, 2, 2)
        for i in range(4):
            h = ResStage(
                depth=self.depths[i],
                mid=mids[i],
                out=outs[i],
                temporal_kernel=self.temporal_kernels[i],
                spatial_stride=strides[i],
                dtype=dt,
                name=f"res_{i + 2}",
            )(h)
        return h


def _make_resnext(dtype):
    from shgvqa_tpu.models.backbones_extra import ResNeXt101

    return ResNeXt101(dtype=dtype)


def _make_slowfast_r50(dtype):
    from shgvqa_tpu.models.backbones_extra import SlowFastR50

    return SlowFastR50(dtype=dtype)


def _make_slowfast_r101(dtype):
    from shgvqa_tpu.models.backbones_extra import SlowFastR50

    return SlowFastR50(dtype=dtype, depths=(3, 4, 23, 3))


def _make_mvit(dtype):
    from shgvqa_tpu.models.mvit import MViTB

    return MViTB(dtype=dtype)


def _make_video_swin(dtype):
    from shgvqa_tpu.models.video_swin import VideoSwin

    return VideoSwin(dtype=dtype)


BACKBONES = {
    "slow_r50": lambda dtype: SlowR50(dtype=dtype),
    "resnext101": _make_resnext,
    "slowfast_r50": _make_slowfast_r50,
    "slowfast_r101": _make_slowfast_r101,
    "mvit_B": _make_mvit,
    # beyond-reference: the reference NYIs video_swin; our implemented
    # Swin-B trunk registers under an _impl suffix so plain 'video_swin'
    # keeps exact reference behavior (NotImplementedError)
    "video_swin_impl": _make_video_swin,
}


def make_backbone(name: str, dtype=jnp.float32) -> nn.Module:
    """Backbone registry (video_encoder.py backbone_dict equivalent):
    slow_r50 (every published recipe), resnext101 (per-frame 2D),
    slowfast_r50/r101 (two-pathway), mvit_B (multiscale ViT).  'video_swin'
    raises NotImplementedError exactly like the reference
    (video_encoder.py:92-95); 'video_swin_impl' selects our implemented
    Video Swin-B trunk (models/video_swin.py, beyond-reference)."""
    if name not in BACKBONES:
        raise NotImplementedError(
            f"backbone '{name}' not implemented; available: "
            f"{sorted(BACKBONES)}"
            + (" ('video_swin_impl' provides the implemented Swin trunk)"
               if name == "video_swin" else "")
        )
    return BACKBONES[name](dtype)
