"""Typed configuration for the framework.

Replaces the reference's import-time global argparse namespace
(``AGQA/src/param.py:33-201``) with explicit dataclasses.  Every flag that the
reference README documents is representable here; ``configs/cli.py`` maps the
reference's exact CLI spelling (``--taskHGQA``, ``--llayers``, ...) onto these
dataclasses so published commands keep working.

TPU-specific knobs (dtype policy, mesh shape, kernel selection) have no
reference counterpart and live in their own fields.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class EncoderConfig:
    """LXMERT-style tri-stream encoder dimensions (bert-base by default).

    Mirrors the facts in ``modeling_capsbert.py:206-263`` (BertConfig) and
    ``VisualConfig`` (``modeling_capsbert.py:156-204``).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02

    # layer counts (reference: --llayers/--xlayers/--rlayers, README uses 5/2/5)
    l_layers: int = 5
    x_layers: int = 2
    r_layers: int = 5

    # cross-modal layer variant: 'cross' | 'self' | 'cross_self' | 'old'
    # (reference --crossAttnType; 'old' behaves as 'cross')
    cross_attn_type: str = "cross"

    # Compile layer stacks as lax.scan over stacked params instead of
    # unrolled calls: ~4x fewer XLA ops, 6x faster on per-op-dispatch
    # backends (measured); param trees gain a leading layer axis, so keep
    # False when transplanting reference weights.
    scan_layers: bool = False

    # The reference builds its x_layers as N references to ONE module instance,
    # so all cross-modal layers are weight-tied (modeling_capsbert.py:1247-1249).
    # That accidental semantic is the published behavior; keep it the default
    # and expose an untied option.
    tie_x_layers: bool = True

    # visual tokenizer (VisualFeatEncoder, modeling_capsbert.py:966-1073)
    # no_caps=True is every published recipe (--noCaps); False switches to the
    # EM-routing capsule tokenizer (models/capsules.py)
    no_caps: bool = True
    num_prim_caps: int = 32       # --NUM_PRIM_CAPS
    num_vis_caps: int = 32        # --NUM_VIS_CAPS
    pose_dim: int = 4             # --POSE_DIM
    # language-conditioned capsule masking: the reference capsule forward
    # ALWAYS masks the capsule tokens with a softmax over capsule types from
    # the language CLS before the visual stack (modeling_capsbert.py:
    # 1448-1458); True is reference behavior (no flag exists upstream),
    # False is an ablation knob
    caps_mask_features: bool = True
    caps_skip_connection: bool = False # --skipConnection
    # --sharedWeights: the visual stream runs through the LANGUAGE layers
    # (one weight set for both streams) instead of separate r_layers —
    # LXRTCapsulesEncoder's shared_weights branch
    # (modeling_capsbert.py:1366,1471-1477)
    shared_weights: bool = False
    # --crossAttn: in the CAPSULE path the cross-modal x_layers exist and
    # run only when set (modeling_capsbert.py:1360-1363,1485-1488; argparse
    # default False, param.py:90) — the default capsule encoder has NO
    # stream interaction beyond language-conditioned masking.  The no-caps
    # path always cross-attends (NoCapsEncoder ignores the flag).
    caps_cross_attn: bool = False
    # --patches: linear 32x32-RGB-patch tokenizer instead of backbone+conv
    # (modeling_capsbert.py:978-996; visual_feat_dim flips to 3072 there).
    # The backbone is skipped entirely — frames are patchified on device.
    patches: bool = False
    # --vitInit: visual-stream r_layers are pre-LN ViT blocks (loadable from
    # a timm vit_base_patch32_224 checkpoint via tools/convert_vit.py,
    # start index = --startIndex), called without an attention mask
    # (modeling_capsbert.py:1365-1390, 1401-1403)
    vit_init: bool = False
    visual_feat_dim: int = 2048
    visual_t: int = 8          # temporal tokens after conv compression 16 -> 8
    visual_hw: int = 7         # spatial tokens per side
    # visual token sequence = t*hw*hw + 1 CLS = 393

    @property
    def visual_seq_length(self) -> int:
        return self.visual_t * self.visual_hw * self.visual_hw + 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class DecoderConfig:
    """Situation-hypergraph DETR-style decoder (lxrt/transformer.py:86-297)."""

    num_layers: int = 5            # --dlayers
    num_heads: int = 12
    ffn_dim: int = 2048
    dropout: float = 0.15          # --decoderDropRate
    emb_dropout: float = 0.15      # --embDropRate (action query embeddings)
    linear_cls: bool = False       # --linearCls: plain Linear classifier heads


@dataclass(frozen=True)
class DataConfig:
    """Dataset geometry and paths."""

    dataset: str = "agqa"          # 'agqa' | 'star'
    train_split: str = "train"
    valid_split: Optional[str] = "valid"
    test_split: Optional[str] = None

    data_dir: str = "data"         # annotations + vocab artifacts
    frame_dir: str = "frames"      # decoded video frames root

    clip_len: int = 16             # --clipLEN
    num_situations: int = 16       # --numSituations
    num_rel: int = 8               # --numRel
    num_act: int = 3               # --numAct
    max_seq_length: int = 40       # MAX_STAR_LENGTH (agqa_model.py:14)
    image_size: int = 224

    augment_type: str = "no_aug"   # --augmentType
    # dtype for the on-device frames pipeline (convert/augment/normalize).
    # "" = follow compute_dtype: bf16 halves every full-frames HBM pass
    # (the b64 tensor is 616 MB f32, and rand_aug is ~60 passes over it);
    # uint8 pixels are exact in bf16 (integers <= 256) and the backbone
    # casts to bf16 immediately after anyway.  Parity tests run under
    # compute_dtype=float32 and are unaffected.
    aug_dtype: str = ""
    # gather heavy augmentation op classes (geometry/equalize/sharpness)
    # into fixed-capacity sub-batches instead of running them on the full
    # batch (data/transforms._apply_layer_batch).  Bit-exact (lax.cond
    # falls back to the full-batch path on capacity overflow); False = the
    # round-2 full-batch formulation (A/B lever).
    aug_subbatch: bool = True
    # aug_mix only: run the 3 augmentation chains as ONE folded (3B) batch
    # instead of 3 sequential B-batches (bit-identical; 6 layer passes ->
    # 2 and better sub-batch cap amortization — data/transforms.py
    # aug_mix_batch).  False = the round-3 sequential form (A/B lever).
    aug_fold_chains: bool = True
    qa_arrange_type: str = "add_sep_all"  # --qaArrangeType (STAR)
    qtype: str = "Feasibility"     # --qType (STAR filter)
    merge_data: bool = False       # --mergeData
    merge_all: bool = False        # --mergeAll

    # AGQA test-protocol selectors
    novel_comp: bool = False       # --novelComp
    indirect_ref: bool = False     # --indirectRef
    comp_steps: bool = False       # --compSteps

    tiny: bool = False             # --tiny (512 items)
    fast: bool = False             # --fast (5000 items)
    train_sub_set: bool = False    # --trainSubSet

    num_workers: int = 8           # decode worker threads
    prefetch: int = 2

    # --parityEval: drop the last partial valid/test batch like the
    # reference's drop_last=True loaders (agqaHGQA.py:74-78) so metric
    # comparisons against a reference run see the same item set.  Default
    # keeps every item (pad + n_valid) — better behavior, documented
    # divergence (data/pipeline.py).
    parity_eval: bool = False

    @property
    def hg_tokens_per_situation(self) -> int:
        return self.num_rel + self.num_act

    @property
    def num_rel_queries(self) -> int:
        return self.num_situations * self.num_rel     # 128

    @property
    def num_act_queries(self) -> int:
        return self.num_situations * self.num_act     # 48


@dataclass(frozen=True)
class OptimConfig:
    """BertAdam-equivalent optimizer (lxrt/optimization.py:52-180)."""

    optim: str = "bert"
    lr: float = 1e-5
    epochs: int = 100
    batch_size: int = 32
    eval_batch_size: int = 8
    warmup: float = 0.1            # fraction of total steps
    schedule: str = "warmup_linear"
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-6
    weight_decay: float = 0.01
    grad_clip: float = 5.0
    early_stop_patience: int = 10  # epochs without valid improvement


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for pjit scale-out.  The reference's only parallelism is
    single-process nn.DataParallel over <=2 GPUs (agqaHGQA.py:124-129); here
    the same capability (and beyond) is a mesh axis assignment."""

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 means "all devices on the data axis"
    data_parallel: int = -1
    model_parallel: int = 1


@dataclass(frozen=True)
class Config:
    """Top-level run configuration."""

    # task selection (reference --taskQ/--taskVQA/--taskHGQA/--taskVHGA/--taskHGVQA)
    task: str = "hgqa"             # 'q' | 'vqa' | 'hgqa' | 'vhga' | 'hgvqa'

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    backbone: str = "slow_r50"     # --backbone
    freeze_backbone: bool = True   # STAR freezes explicitly (star.py:87-88);
                                   # AGQA only eval()s BN — see models/backbone.py
    # --freezeWeights: freeze the LXRT encoder (embeddings + l/r layers +
    # visual tokenizer) EXCEPT the cross-modal x_layers; pooler, decoders
    # and heads stay trainable (NoCapsModel.freeze_weights,
    # modeling_capsbert.py:1905-1909, applied at build when the flag is set,
    # :2183-2184)
    freeze_weights: bool = False
    from_scratch: bool = True      # --fromScratch (published recipes train from scratch)

    # hypergraph supervision
    loss_hg_per_frame: bool = True  # --LossHGPerFrame
    use_hg_mask: bool = False       # --useHGMask
    gt_hg: bool = False             # --GTHG
    eos_coef: float = 0.1           # --noObjWeight: background-class CE weight
    mce_loss: bool = False          # --mceLoss: CE instead of BCE on answer head

    # class counts (+1 background each, background index 0)
    num_rel_classes: int = 456      # AGQA (agqaHGQA.py:102); STAR: 563
    num_act_classes: int = 157      # AGQA action_classes.txt; STAR: 111
    num_answers: int = 171          # resolved from answer vocab at dataset load

    # use post-cross-attention streams as decoder memory (--afterCrossAttnFeats)
    after_cross_attn_feats: bool = False

    seed: int = 9595                # --seed
    output: str = "snap/run"        # --output
    load: Optional[str] = None      # --load
    log_freq: int = 50              # --logFreq
    output_attention: bool = False  # --outputAttn

    # TPU execution policy (no reference counterpart)
    compute_dtype: str = "bfloat16"   # matmul/activation dtype under jit
    param_dtype: str = "float32"
    # --quantBackbone int8: run the FROZEN trunk in int8 (per-out-channel
    # weight quant in-graph, static per-tensor activation scales from a
    # calibration pass = any apply with mutable=['quant_stats'], which
    # model.init does on its example batch).  The trunk is HBM-bound in
    # bf16; int8 halves the streamed bytes AND doubles the MXU rate — the
    # res_2 bottleneck chain measures 0.61x the bf16 time
    # (tools/proto_int8_backbone.py).  slow_r50 only; requires
    # freeze_backbone (round() has zero gradient).
    quant_backbone: str = ""
    remat: bool = False               # jax.checkpoint the encoder blocks
    # remat save policy: "" = save nothing (full recompute); "dots" =
    # jax.checkpoint_policies.dots_with_no_batch_dims_saveable (keep matmul
    # outputs, recompute the elementwise tail — LN f32 intermediates, GeLU,
    # dropout products — targeting the backward activation-streaming HBM
    # traffic, PERF.md §2); "dots_batch" = dots_saveable
    remat_policy: str = ""
    profile: bool = False             # capture a jax.profiler trace
    use_pallas_attention: bool = False  # fused attention EVERYWHERE (A/B knob)
    # fused attention at TRAINING sites only (in-kernel probs dropout skips
    # the u32 dropout-bit tensors XLA materializes; b64 527 -> 490 ms/step).
    # Inference keeps the XLA path, which measured faster (322 vs 307).
    use_pallas_attention_train: bool = True
    use_pallas_ffn: bool = True       # fused FFN block for eval/inference
    # fused FFN in training: NEUTRAL alone (128.2 vs 126.9 clips/s) and
    # PATHOLOGICAL combined with the train attention kernel (62 vs 134
    # clips/s at b64, round-2 continuation A/B) — keep opt-in, never
    # combine with use_pallas_attention_train
    use_pallas_ffn_train: bool = False
    donate_state: bool = True
    # Train k optimizer steps per device launch (lax.scan over k staged
    # batches; flat-mode only, --stepsPerLoop).  Amortizes per-launch host
    # dispatch — b64 flagship 130 -> 152 clips/s/chip at k=8 on the
    # per-thunk-dispatch relay; same math and per-step PRNG keys as k
    # single steps (float noise only from scan-body fusion, ~1e-5 rel).
    steps_per_loop: int = 1
    # Run the FROZEN backbone forward in N sequential micro-chunks over the
    # batch (nn.scan, weights broadcast).  Purely a peak-memory lever: the
    # frozen trunk's activations are live only during its own forward, so
    # chunking halves the ~3.2 GB/stage activation peak that makes the b128
    # train step spill (head-only b128 = 629 ms and backbone-only b128 =
    # 202 ms both scale cleanly; only the combined step blew up to 1.47 s).
    # No effect on numerics; ignored when the batch doesn't divide.
    backbone_chunks: int = 1

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def background_idx(self) -> int:
        return 0

    def validate(self) -> None:
        assert self.task in ("q", "vqa", "hgqa", "vhga", "hgvqa"), self.task
        assert self.encoder.hidden_size % self.encoder.num_heads == 0
        assert self.data.num_rel_queries % self.data.clip_len == 0
        assert self.encoder.cross_attn_type in ("cross", "self", "cross_self", "old")


def tiny_test_config(**overrides) -> Config:
    """A CPU-sized config for unit tests: tiny dims, same topology."""
    enc = EncoderConfig(
        vocab_size=128,
        hidden_size=32,
        num_heads=4,
        intermediate_size=64,
        l_layers=2,
        x_layers=2,
        r_layers=2,
        visual_feat_dim=16,
        visual_t=2,
        visual_hw=2,
    )
    dec = DecoderConfig(num_layers=2, num_heads=4, ffn_dim=64)
    data = DataConfig(
        clip_len=4,
        num_situations=4,
        num_rel=3,
        num_act=2,
        max_seq_length=12,
        image_size=32,
    )
    optim = OptimConfig(lr=1e-3, epochs=2, batch_size=2, eval_batch_size=2)
    cfg = Config(
        encoder=enc,
        decoder=dec,
        data=data,
        optim=optim,
        num_rel_classes=11,
        num_act_classes=7,
        num_answers=13,
        compute_dtype="float32",
    )
    cfg = cfg.replace(**overrides)
    cfg.validate()
    return cfg
