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
    backbone never leaves eval mode).  ``fold()`` exposes the folded f32
    (inv, shift) pair so the int8 path can fuse BN into its dequant
    epilogue; ``__call__`` is the same math as always."""

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros((self.features,)))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones((self.features,)))

    def fold(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        inv = self.scale / jnp.sqrt(self.var.value + self.eps)
        return inv, self.bias - self.mean.value * inv

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inv, shift = self.fold()
        return x * inv.astype(self.dtype) + shift.astype(self.dtype)


class _StemKernel(nn.Module):
    """Declares a conv kernel at the exact path nn.Conv would
    ("<name>/kernel", same shape + he_normal init => bit-identical draws),
    so alternate formulations (the space-to-depth stem below, the int8
    bottleneck path) keep checkpoints and the weight converters
    byte-compatible with the plain nn.Conv formulation."""

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


# ---------------------------------------------------------------------------
# int8 quantized frozen-backbone path (inference / frozen-trunk training).
#
# The frozen trunk is HBM-bandwidth-bound in bf16 (PERF.md par. 2/6: ~90 ms
# of the 192 ms b64 inference batch, every bf16 reformulation measured
# slower).  v5e's MXU executes s8 x s8 -> s32 at 2x the bf16 peak and int8
# activations halve the streamed bytes, so the quantized path attacks the
# measured floor itself: the res_2-dims bottleneck chain runs at 0.61x the
# bf16 time (tools/proto_int8_backbone.py).
#
# Scheme (weights are frozen, so everything is static — no in-loop
# calibration work):
#   weights      symmetric per-output-channel int8, quantized in-graph from
#                the f32 params (checkpoint format unchanged; the dequant
#                scale folds into the FrozenBatchNorm epilogue)
#   activations  symmetric per-tensor int8 with STATIC scales stored in a
#                'quant_stats' flax collection.  Any apply with
#                mutable=["quant_stats"] IS a calibration pass (full-
#                precision forward recording running max-abs) — model.init
#                therefore calibrates on its example batch for free.
#   streaming    blocks hand each other int8 tensors + their scale; the
#                residual dequant, BN, ReLU and requant all fuse into the
#                conv epilogues, so each block streams ~half the bytes.
# ---------------------------------------------------------------------------


def quant_sym(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric int8 quantization; the divide runs in f32 so the scale is
    applied exactly (the elementwise chain fuses into the producer)."""
    s = jnp.maximum(jnp.asarray(scale, jnp.float32), 1e-12)
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                    -127, 127).astype(jnp.int8)


def quant_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 for a (kT,kH,kW,Ci,Co) f32 kernel.
    Runs in-graph every call: kernels are ~30 MB total, noise next to the
    multi-GB activation traffic it saves."""
    axes = tuple(range(w.ndim - 1))
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=axes) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def _qconv(x_q: jnp.ndarray, w_q: jnp.ndarray,
           strides: Tuple[int, int, int]) -> jnp.ndarray:
    """s8 x s8 -> s32 NDHWC convolution (MXU int8 path)."""
    import jax

    pad = tuple((k // 2, k // 2) for k in w_q.shape[:3])
    return jax.lax.conv_general_dilated(
        x_q, w_q, strides, pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32)


def _max_pool_i8(x_q: jnp.ndarray) -> jnp.ndarray:
    """(1,3,3)/s(1,2,2) max-pool on int8.  Quantize-then-pool equals
    pool-then-quantize exactly (round and clip are non-decreasing, so max
    commutes with the quantizer)."""
    import jax

    return jax.lax.reduce_window(
        x_q, jnp.int8(-128), jax.lax.max,
        window_dimensions=(1, 1, 3, 3, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding=((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))


class Bottleneck3D(nn.Module):
    mid: int
    out: int
    temporal_kernel: int = 1
    spatial_stride: int = 1
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, s_in=None):
        dt = self.dtype
        tk = self.temporal_kernel
        ss = self.spatial_stride
        if not self.quant:
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
        return self._quant_call(x, s_in)

    def _quant_call(self, x, s_in):
        """int8 path.  Kernels/BNs are declared at the exact paths the
        plain path uses (same names, shapes, inits), so checkpoints and
        the torch weight converters are byte-compatible across the flag."""
        import jax

        dt = self.dtype
        tk = self.temporal_kernel
        ss = self.spatial_stride
        ci = x.shape[-1]
        has_proj = ci != self.out or ss != 1
        ka = _StemKernel((tk, 1, 1, ci, self.mid), name="conv_a")()
        kb = _StemKernel((1, 3, 3, self.mid, self.mid), name="conv_b")()
        kc = _StemKernel((1, 1, 1, self.mid, self.out), name="conv_c")()
        bn_a = FrozenBatchNorm(self.mid, dtype=dt, name="bn_a")
        bn_b = FrozenBatchNorm(self.mid, dtype=dt, name="bn_b")
        bn_c = FrozenBatchNorm(self.out, dtype=dt, name="bn_c")
        if has_proj:
            kp = _StemKernel((1, 1, 1, ci, self.out), name="conv_proj")()
            bn_p = FrozenBatchNorm(self.out, dtype=dt, name="bn_proj")
        zero = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
        s_a = self.variable("quant_stats", "s_a", zero)
        s_b = self.variable("quant_stats", "s_b", zero)
        s_out = self.variable("quant_stats", "s_out", zero)

        if self.is_mutable_collection("quant_stats"):
            # calibration: the full-precision forward (same numerics as the
            # plain path), recording running max-abs scales
            def conv(h, k, st):
                pad = tuple((d // 2, d // 2) for d in k.shape[:3])
                return jax.lax.conv_general_dilated(
                    h.astype(dt), k.astype(dt), st, pad,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

            a = nn.relu(bn_a(conv(x, ka, (1, 1, 1))))
            s_a.value = jnp.maximum(
                s_a.value, jnp.max(jnp.abs(a)).astype(jnp.float32) / 127.0)
            b = nn.relu(bn_b(conv(a, kb, (1, ss, ss))))
            s_b.value = jnp.maximum(
                s_b.value, jnp.max(jnp.abs(b)).astype(jnp.float32) / 127.0)
            c = bn_c(conv(b, kc, (1, 1, 1)))
            if has_proj:
                r = bn_p(conv(x, kp, (1, ss, ss)))
            else:
                r = x
            y = nn.relu(c + r)
            s_out.value = jnp.maximum(
                s_out.value, jnp.max(jnp.abs(y)).astype(jnp.float32) / 127.0)
            return y

        # quantized inference: x is int8 with per-tensor scale s_in
        assert s_in is not None, (
            "quantized Bottleneck3D needs (x_q, s_in); run a calibration "
            "apply (mutable=['quant_stats']) first")
        ep = lambda v: jnp.maximum(v, 1e-12)  # noqa: E731

        def deq(acc32, s_act, sw, bn):
            inv, shift = bn.fold()
            scale = (s_act * sw * inv).astype(dt)
            return acc32.astype(dt) * scale + shift.astype(dt)

        wa_q, swa = quant_weight(ka)
        a = nn.relu(deq(_qconv(x, wa_q, (1, 1, 1)), ep(s_in), swa, bn_a))
        a_q = quant_sym(a, s_a.value)
        wb_q, swb = quant_weight(kb)
        b = nn.relu(deq(_qconv(a_q, wb_q, (1, ss, ss)),
                        ep(s_a.value), swb, bn_b))
        b_q = quant_sym(b, s_b.value)
        wc_q, swc = quant_weight(kc)
        c = deq(_qconv(b_q, wc_q, (1, 1, 1)), ep(s_b.value), swc, bn_c)
        if has_proj:
            wp_q, swp = quant_weight(kp)
            r = deq(_qconv(x, wp_q, (1, ss, ss)), ep(s_in), swp, bn_p)
        else:
            r = x.astype(dt) * jnp.asarray(ep(s_in), dt)
        y = nn.relu(c + r)
        return quant_sym(y, s_out.value), s_out.value


class ResStage(nn.Module):
    depth: int
    mid: int
    out: int
    temporal_kernel: int
    spatial_stride: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, s_in=None):
        quant_run = (self.quant
                     and not self.is_mutable_collection("quant_stats"))
        s = s_in
        for i in range(self.depth):
            block = Bottleneck3D(
                mid=self.mid,
                out=self.out,
                temporal_kernel=self.temporal_kernel,
                spatial_stride=self.spatial_stride if i == 0 else 1,
                dtype=self.dtype,
                quant=self.quant,
                name=f"block_{i}",
            )
            if quant_run:
                x, s = block(x, s)
            else:
                x = block(x)
        return (x, s) if quant_run else x


class SlowR50(nn.Module):
    """Slow-pathway 3D ResNet-50 feature extractor (head removed).

    ``quant=True`` selects the int8 inference path (see the quant block
    comment above): the stem stays bf16 (3-channel convs don't tile the
    MXU in int8 usefully), its output is quantized right after the ReLU
    (exactly commutes with the max-pool), and the four stages stream int8
    between blocks; the final stage output is dequantized to ``dtype``.
    An apply with mutable=["quant_stats"] (model.init does this) runs the
    full-precision forward and records the activation scales instead."""

    dtype: Dtype = jnp.float32
    depths: Sequence[int] = (3, 4, 6, 3)
    temporal_kernels: Sequence[int] = (1, 1, 3, 3)
    # width overrides let tests run the exact topology at toy scale
    stem_width: int = 64
    mids: Sequence[int] = (64, 128, 256, 512)
    outs: Sequence[int] = (256, 512, 1024, 2048)
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, H, W, 3) normalized frames -> (B, T, H/32, W/32, 2048)."""
        dt = self.dtype
        x = x.astype(dt)
        h = _conv(self.stem_width, (1, 7, 7), (1, 2, 2), dt, "stem_conv")(x)
        h = FrozenBatchNorm(self.stem_width, dtype=dt, name="stem_bn")(h)
        h = nn.relu(h)
        quant_run = False
        if self.quant:
            s_stem = self.variable("quant_stats", "s_stem",
                                   lambda: jnp.zeros((), jnp.float32))
            if self.is_mutable_collection("quant_stats"):
                s_stem.value = jnp.maximum(
                    s_stem.value,
                    jnp.max(jnp.abs(h)).astype(jnp.float32) / 127.0)
            else:
                quant_run = True
                h = quant_sym(h, s_stem.value)
                s = s_stem.value
        if quant_run:
            h = _max_pool_i8(h)
        else:
            h = nn.max_pool(h, window_shape=(1, 3, 3), strides=(1, 2, 2),
                            padding=((0, 0), (1, 1), (1, 1)))
        mids = self.mids
        outs = self.outs
        strides = (1, 2, 2, 2)
        for i in range(4):
            stage = ResStage(
                depth=self.depths[i],
                mid=mids[i],
                out=outs[i],
                temporal_kernel=self.temporal_kernels[i],
                spatial_stride=strides[i],
                dtype=dt,
                quant=self.quant,
                name=f"res_{i + 2}",
            )
            if quant_run:
                h, s = stage(h, s)
            else:
                h = stage(h)
        if quant_run:
            h = h.astype(dt) * jnp.maximum(s, 1e-12).astype(dt)
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
    "slow_r50": lambda dtype, **kw: SlowR50(dtype=dtype, **kw),
    "resnext101": _make_resnext,
    "slowfast_r50": _make_slowfast_r50,
    "slowfast_r101": _make_slowfast_r101,
    "mvit_B": _make_mvit,
    # beyond-reference: the reference NYIs video_swin; our implemented
    # Swin-B trunk registers under an _impl suffix so plain 'video_swin'
    # keeps exact reference behavior (NotImplementedError)
    "video_swin_impl": _make_video_swin,
}


def make_backbone(name: str, dtype=jnp.float32,
                  quant: str = "") -> nn.Module:
    """Backbone registry (video_encoder.py backbone_dict equivalent):
    slow_r50 (every published recipe), resnext101 (per-frame 2D),
    slowfast_r50/r101 (two-pathway), mvit_B (multiscale ViT).  'video_swin'
    raises NotImplementedError exactly like the reference
    (video_encoder.py:92-95); 'video_swin_impl' selects our implemented
    Video Swin-B trunk (models/video_swin.py, beyond-reference).

    ``quant='int8'`` selects the int8 frozen-trunk path (slow_r50 only;
    see SlowR50.quant)."""
    if name not in BACKBONES:
        raise NotImplementedError(
            f"backbone '{name}' not implemented; available: "
            f"{sorted(BACKBONES)}"
            + (" ('video_swin_impl' provides the implemented Swin trunk)"
               if name == "video_swin" else "")
        )
    if quant:
        if quant != "int8":
            raise ValueError(f"unknown quant mode '{quant}' (use 'int8')")
        if name != "slow_r50":
            raise NotImplementedError(
                "--quantBackbone int8 is implemented for slow_r50 (the "
                f"flagship trunk); got backbone '{name}'")
        return BACKBONES[name](dtype, quant=True)
    return BACKBONES[name](dtype)
