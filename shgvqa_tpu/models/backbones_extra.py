"""Additional video backbones: ResNeXt-101 (per-frame 2D) and SlowFast-R50.

Registry parity with ``video_encoder.py``:
- 'resnext101' (:67-80): the reference reshapes (B,C,T,H,W) to per-frame 2D,
  runs a timm ResNeXt-101, and restores the temporal axis ->
  (B, 2048, T, 7, 7).  Here: ResNeXt-101 32x8d in flax (grouped convs via
  feature_group_count), vmapped over time by folding T into the batch.
- 'slowfast_r50' / 'slowfast_r101' (:52-64): two-pathway SlowFast with
  time-strided lateral connections (alpha=4, beta=1/8 per the paper);
  features are the channel-concat of both pathways at FAST temporal
  resolution (slow repeated alpha-fold), one (B, T, H/32, W/32, C) map.
- 'mvit_B': attention-based video backbone; represented by a patch-embed +
  transformer trunk at MViT-B dims (simplified single-scale trunk — the
  reference's own mvit path was torch.hub-dependent and untested in its
  published recipes).

All run frozen-BN eval mode like SlowR50.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from shgvqa_tpu.models.backbone import FrozenBatchNorm, _conv

Dtype = Any


def _conv2d(features: int, kernel: Tuple[int, int],
            strides: Tuple[int, int], dtype, name: str,
            groups: int = 1) -> nn.Conv:
    pad = tuple((k // 2, k // 2) for k in kernel)
    return nn.Conv(
        features, kernel_size=kernel, strides=strides, padding=pad,
        use_bias=False, feature_group_count=groups, dtype=dtype,
        param_dtype=jnp.float32, kernel_init=nn.initializers.he_normal(),
        name=name,
    )


class BottleneckX(nn.Module):
    """ResNeXt bottleneck: 1x1 -> grouped 3x3 -> 1x1."""

    mid: int
    out: int
    stride: int = 1
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        residual = x
        h = _conv2d(self.mid, (1, 1), (1, 1), dt, "conv1")(x)
        h = FrozenBatchNorm(self.mid, dtype=dt, name="bn1")(h)
        h = nn.relu(h)
        h = _conv2d(self.mid, (3, 3), (self.stride, self.stride), dt,
                    "conv2", groups=self.groups)(h)
        h = FrozenBatchNorm(self.mid, dtype=dt, name="bn2")(h)
        h = nn.relu(h)
        h = _conv2d(self.out, (1, 1), (1, 1), dt, "conv3")(h)
        h = FrozenBatchNorm(self.out, dtype=dt, name="bn3")(h)
        if residual.shape[-1] != self.out or self.stride != 1:
            residual = _conv2d(self.out, (1, 1),
                               (self.stride, self.stride), dt,
                               "downsample_conv")(residual)
            residual = FrozenBatchNorm(self.out, dtype=dt,
                                       name="downsample_bn")(residual)
        return nn.relu(h + residual)


class ResNeXt101(nn.Module):
    """ResNeXt-101 32x8d trunk applied per frame.

    (B, T, H, W, 3) -> (B, T, H/32, W/32, 2048)."""

    dtype: Dtype = jnp.float32
    depths: Sequence[int] = (3, 4, 23, 3)
    groups: int = 32
    width_per_group: int = 8
    stem_width: int = 64                       # toy-size override for tests
    outs: Sequence[int] = (256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        b, t, h, w, c = x.shape
        x = x.reshape(b * t, h, w, c).astype(dt)
        out = _conv2d(self.stem_width, (7, 7), (2, 2), dt, "stem_conv")(x)
        out = FrozenBatchNorm(self.stem_width, dtype=dt, name="stem_bn")(out)
        out = nn.relu(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)))
        outs = self.outs
        for si in range(4):
            mid = self.groups * self.width_per_group * (2 ** si)
            for bi in range(self.depths[si]):
                out = BottleneckX(
                    mid=mid, out=outs[si],
                    stride=2 if (bi == 0 and si > 0) else 1,
                    groups=self.groups, dtype=dt,
                    name=f"layer{si + 1}_block{bi}",
                )(out)
        _, hh, ww, cc = out.shape
        return out.reshape(b, t, hh, ww, cc)


class SlowFastR50(nn.Module):
    """Two-pathway SlowFast (alpha=4, beta=1/8) — pytorchvideo
    ``create_slowfast`` topology exactly, so ``tools/convert_slowfast.py``
    can load the torch.hub ``slowfast_r50`` / ``slowfast_r101`` checkpoints
    the reference depends on (``video_encoder.py:55-79``).

    pytorchvideo facts reproduced here (hub SLOWFAST_8x8_R50):
    - stems: slow conv(1,7,7)/s(1,2,2) width 64; fast conv(5,7,7)/s(1,2,2)
      width 64/beta_inv = 8; both BN+ReLU+maxpool(1,3,3)/s(1,2,2).
    - FuseFastToSlow after the stem and after stages 1-3 (NOT after stage
      4): conv_fast_to_slow kernel (7,1,1), stride (alpha,1,1), padding
      (3,0,0), out = fast_channels * fusion_ratio(2), then BN + ReLU, then
      channel-concat [slow, fused].
    - slow stage inner widths (64,128,256,512), outs (256,512,1024,2048),
      temporal conv_a kernels (1,1,3,3); fast = slow/beta_inv widths with
      temporal kernel 3 in every stage; spatial stride 2 at stages 2-4.
    - the reference replaces the head AND the pool with Identity
      (``video_encoder.py:58-59``) so the torch net yields the raw
      [slow, fast] feature-map list.

    Output contract (TPU-side design, unchanged): the two pathways are
    channel-concatenated at FAST temporal resolution (each slow step
    repeated alpha times) so the conv tokenizer's two valid kernel-5
    temporal convs still apply: (B, T, H, W, 3) ->
    (B, T, H/32, W/32, 2048+256)."""

    dtype: Dtype = jnp.float32
    alpha: int = 4
    beta_inv: int = 8
    fusion_ratio: int = 2
    fusion_kernel: int = 7
    depths: Sequence[int] = (3, 4, 6, 3)
    # slow-pathway widths; fast = width // beta_inv (toy-size overridable)
    stem_width: int = 64
    mids: Sequence[int] = (64, 128, 256, 512)
    outs: Sequence[int] = (256, 512, 1024, 2048)

    def _fuse(self, idx: int, slow: jnp.ndarray,
              fast: jnp.ndarray) -> jnp.ndarray:
        """FuseFastToSlow: time-strided conv + BN + ReLU on the fast
        pathway, channel-concat onto slow (order [slow, fused])."""
        dt = self.dtype
        fk = self.fusion_kernel
        out_ch = fast.shape[-1] * self.fusion_ratio
        lat = nn.Conv(
            out_ch, kernel_size=(fk, 1, 1), strides=(self.alpha, 1, 1),
            padding=((fk // 2, fk // 2), (0, 0), (0, 0)), use_bias=False,
            dtype=dt, param_dtype=jnp.float32,
            kernel_init=nn.initializers.he_normal(),
            name=f"fuse_{idx}_conv")(fast)
        lat = FrozenBatchNorm(out_ch, dtype=dt, name=f"fuse_{idx}_bn")(lat)
        lat = nn.relu(lat)
        return jnp.concatenate([slow, lat], axis=-1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from shgvqa_tpu.models.backbone import ResStage

        dt = self.dtype
        x = x.astype(dt)
        # PackPathway transform equivalent: slow sees every alpha-th frame
        slow_in = x[:, :: self.alpha]
        fast_in = x

        slow = _conv(self.stem_width, (1, 7, 7), (1, 2, 2), dt,
                     "slow_stem_conv")(slow_in)
        slow = FrozenBatchNorm(self.stem_width, dtype=dt,
                               name="slow_stem_bn")(slow)
        slow = nn.relu(slow)
        slow = nn.max_pool(slow, (1, 3, 3), strides=(1, 2, 2),
                           padding=((0, 0), (1, 1), (1, 1)))
        fast_w = self.stem_width // self.beta_inv
        fast = _conv(fast_w, (5, 7, 7), (1, 2, 2), dt, "fast_stem_conv")(
            fast_in)
        fast = FrozenBatchNorm(fast_w, dtype=dt, name="fast_stem_bn")(fast)
        fast = nn.relu(fast)
        fast = nn.max_pool(fast, (1, 3, 3), strides=(1, 2, 2),
                           padding=((0, 0), (1, 1), (1, 1)))

        slow = self._fuse(0, slow, fast)

        slow_tk = (1, 1, 3, 3)
        strides = (1, 2, 2, 2)
        for i in range(4):
            slow = ResStage(
                depth=self.depths[i], mid=self.mids[i], out=self.outs[i],
                temporal_kernel=slow_tk[i], spatial_stride=strides[i],
                dtype=dt, name=f"slow_res_{i + 2}",
            )(slow)
            fast = ResStage(
                depth=self.depths[i],
                mid=self.mids[i] // self.beta_inv,
                out=self.outs[i] // self.beta_inv,
                temporal_kernel=3, spatial_stride=strides[i],
                dtype=dt, name=f"fast_res_{i + 2}",
            )(fast)
            if i < 3:
                slow = self._fuse(i + 1, slow, fast)

        # fuse at FAST temporal resolution so the conv tokenizer's two
        # valid kernel-5 temporal convs (T -> T-8) still apply: repeat each
        # slow step alpha times (the reference's slowfast path keeps a
        # 16-frame temporal axis into the tokenizer; star_data.py:221-224
        # uses an 8x8 spatial mask for the 256-pixel slowfast input)
        slow_up = jnp.repeat(slow, self.alpha, axis=1)[:, : fast.shape[1]]
        return jnp.concatenate([slow_up, fast], axis=-1)
