"""Import a TRAINED reference checkpoint into our param trees.

The reference's public contract includes evaluating from a saved
``state_dict`` snapshot: ``torch.save(self.model.state_dict(), {name}.pth)``
and ``--load path/BEST`` which re-loads it with ``module.`` DataParallel
prefixes stripped (``agqaHGQA.py:859-874``, ``README.md:195``).  This module
is the product path for that contract on TPU: a full AGQAModel / STARModel
state_dict -> flax variables transplant, so a user can take a
reference-trained ``.pth`` and run eval/fine-tune here.

Layout facts the mapping encodes (all verified by the transplant parity
tests, tests/test_reference_parity*.py / test_full_model_train_parity.py):

- torch ``nn.Linear`` weights are (out, in) -> flax kernels (in, out): ``.T``.
- torch ``Conv3d`` weights (O, I, kT, kH, kW) -> flax NDHWC (kT, kH, kW, I, O).
- the reference's x_layers are N references to ONE module instance
  (``modeling_capsbert.py:1247-1249``), so every ``x_layers.{i}`` entry holds
  identical tensors; we read ``x_layers.0`` into our tied ``x_tied`` module
  (or into each ``x_{i}`` when built untied).
- ``pooler_dict`` / ``cross_attn_layer`` are ModuleDicts holding ALL variants
  with live params; only the entry for the configured ``cross_attn_type``
  is consumed (``modeling_capsbert.py:1800-1809``, ``:1106-1111``).
- the encoder prefix is task-dependent (``agqa_model.py:37-82``):
  ``lxrt_encoder`` (hgqa/vqa/hgvqa), ``deaf_encoder`` (vhga),
  ``bert_encoder`` (q).
- the frozen video backbone travels INSIDE the checkpoint
  (``vid_encoder.backbone.*``); it re-uses the standalone converters
  (tools/convert_slow_r50.py etc.) on that sub-dict.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Tuple

import numpy as np

from shgvqa_tpu.utils.torch_import import (
    _bert_layer,
    _dense,
    _ln,
    load_torch_state_dict,
)


def strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """DataParallel 'module.' prefix strip (agqaHGQA.py:866-869)."""
    return {(k.replace("module.", "") if "module." in k else k): v
            for k, v in sd.items()}


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` (or ``.npz`` with the same keys) into
    {name: np.ndarray} with ``module.`` prefixes stripped.  Accepts the
    reference's extensionless ``--load path/BEST`` spelling."""
    import os

    if not os.path.isfile(path) and os.path.isfile(path + ".pth"):
        path = path + ".pth"   # reference load() appends .pth (:866)
    return strip_module_prefix(load_torch_state_dict(path))


def _cross_layer(sd: Dict[str, np.ndarray], prefix: str,
                 cross_attn_type: str) -> Dict[str, Any]:
    """One reference cross-modal layer -> our models/cross.py param tree.

    'cross'/'old' -> CrossLayer (shared bidirectional cross-attention,
    modeling_capsbert.py:629-645); 'self' -> SelfCrossLayer (joint
    self-attention, :679-684); 'cross_self' -> CrossAndSelfLayer (:756-768).
    """

    def att(p):     # BertCrossattLayer / BertSelfattLayer 'att'/'self' core
        return {"query": _dense(sd, f"{p}.query"),
                "key": _dense(sd, f"{p}.key"),
                "value": _dense(sd, f"{p}.value")}

    def att_out(p):
        return {"dense": _dense(sd, f"{p}.dense"),
                "ln": _ln(sd, f"{p}.LayerNorm")}

    def ffn(inter_p, out_p):
        return {"intermediate": _dense(sd, f"{inter_p}.dense"),
                "output": _dense(sd, f"{out_p}.dense"),
                "ln": _ln(sd, f"{out_p}.LayerNorm")}

    if cross_attn_type in ("cross", "old"):
        return {
            "visual_attention": {
                "att": att(f"{prefix}.visual_attention.att"),
                "output": att_out(f"{prefix}.visual_attention.output"),
            },
            "lang_ffn": ffn(f"{prefix}.lang_inter", f"{prefix}.lang_output"),
            "visn_ffn": ffn(f"{prefix}.visn_inter", f"{prefix}.visn_output"),
        }
    if cross_attn_type == "self":
        return {
            "cross_att": {
                "self": att(f"{prefix}.cross_att.self"),
                "output": att_out(f"{prefix}.cross_att.output"),
            },
            "vl_ffn": ffn(f"{prefix}.vl_inter", f"{prefix}.vl_output"),
        }
    if cross_attn_type == "cross_self":
        return {
            "visual_attention": {
                "att": att(f"{prefix}.visual_attention.att"),
                "output": att_out(f"{prefix}.visual_attention.output"),
            },
            "self_att_layer": {
                "self": att(f"{prefix}.self_att_layer.self"),
                "output": att_out(f"{prefix}.self_att_layer.output"),
            },
            "vl_ffn": ffn(f"{prefix}.vl_inter", f"{prefix}.vl_output"),
        }
    raise ValueError(f"unknown cross_attn_type {cross_attn_type!r}")


def _decoder_layer(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """Reference TransformerDecoderLayer (lxrt/transformer.py:187-269) ->
    models/decoder.py layer tree (torch MultiheadAttention packed in_proj)."""
    out = {}
    for name in ("self_attn", "multihead_attn"):
        out[name] = {
            "in_proj": {"kernel": sd[f"{prefix}.{name}.in_proj_weight"].T,
                        "bias": sd[f"{prefix}.{name}.in_proj_bias"]},
            "out_proj": _dense(sd, f"{prefix}.{name}.out_proj"),
        }
    out["linear1"] = _dense(sd, f"{prefix}.linear1")
    out["linear2"] = _dense(sd, f"{prefix}.linear2")
    for i in (1, 2, 3):
        out[f"norm{i}"] = _ln(sd, f"{prefix}.norm{i}")
    return out


def _mlp_head(sd: Dict[str, np.ndarray], prefix: str,
              linear_cls: bool) -> Dict[str, Any]:
    """Classifier heads: Sequential(Linear, GeLU, LayerNorm, Linear)
    (agqa_model.py:105-140) or a plain Linear under --linearCls."""
    if linear_cls and f"{prefix}.weight" in sd:
        return _dense(sd, prefix)
    return {"fc1": _dense(sd, f"{prefix}.0"),
            "ln": _ln(sd, f"{prefix}.2"),
            "fc2": _dense(sd, f"{prefix}.3")}


def _hg_embeddings(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "word_embeddings": {
            "embedding": sd[f"{prefix}.word_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": sd[f"{prefix}.token_type_embeddings.weight"]},
        "ln": _ln(sd, f"{prefix}.LayerNorm"),
    }


def _encoder_prefix(sd: Dict[str, np.ndarray]) -> str:
    """Task-dependent encoder attribute (agqa_model.py:37-82)."""
    for name in ("lxrt_encoder", "deaf_encoder", "bert_encoder"):
        if any(k.startswith(f"{name}.model.bert.") for k in sd):
            return f"{name}.model.bert"
    raise ValueError(
        "no reference encoder found in state_dict (expected keys under "
        "lxrt_encoder/deaf_encoder/bert_encoder .model.bert.*)")


def _x_layer_tree(sd, prefix_fmt, dst: Dict[str, Any], cat: str,
                  n_layers: int) -> None:
    """Fill x_tied / x_{i} from the reference's (weight-tied) x layers."""
    if "x_tied" in dst:
        dst["x_tied"] = _cross_layer(sd, prefix_fmt(0), cat)
        return
    for i in range(n_layers):
        key = f"x_{i}"
        if key in dst:
            # every x_layers.{i} entry aliases the same instance upstream;
            # read each index when present, else replicate layer 0
            try:
                dst[key] = _cross_layer(sd, prefix_fmt(i), cat)
            except KeyError:
                dst[key] = _cross_layer(sd, prefix_fmt(0), cat)


def _convert_backbone(sd: Dict[str, np.ndarray], backbone: str
                      ) -> Dict[str, Any]:
    """The checkpoint's frozen trunk (vid_encoder.backbone.*) through the
    standalone weight converters."""
    import os
    import sys

    tools = os.path.join(os.path.dirname(__file__), "..", "..", "tools")
    tools = os.path.abspath(tools)
    if tools not in sys.path:
        sys.path.insert(0, tools)
    sub = {k[len("vid_encoder.backbone."):]: v for k, v in sd.items()
           if k.startswith("vid_encoder.backbone.")}
    if not sub:
        return {}
    if backbone == "slow_r50":
        from convert_slow_r50 import convert
        return convert(sub)
    if backbone.startswith("slowfast"):
        from convert_slowfast import convert
        depths = (3, 4, 23, 3) if backbone.endswith("r101") else (3, 4, 6, 3)
        return convert(sub, depths=depths)
    if backbone == "resnext101":
        from convert_resnext101 import convert
        return convert(sub)
    raise NotImplementedError(
        f"backbone {backbone!r} import not wired; convert separately with "
        f"tools/convert_*.py and load via --backboneWeights")


def reference_to_variables(
    sd: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    cfg,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Transplant a reference AGQAModel/STARModel state_dict into our
    variables ({"params": ..., "batch_stats": ...?}).

    ``variables`` is the (host) tree from an initialized Trainer/model;
    returns (new_variables, report).  Shape mismatches are hard errors — a
    reference checkpoint either matches the configured dims or the run is
    wrong.
    """
    sd = {k: np.asarray(v) for k, v in strip_module_prefix(sd).items()}
    variables = copy.deepcopy(_np_tree(variables))
    params = variables["params"]
    head = params["head"] if "head" in params else params
    enc_cfg = cfg.encoder
    cat = enc_cfg.cross_attn_type
    report: Dict[str, List[str]] = {"mapped": [], "skipped": []}

    ref_enc = _encoder_prefix(sd)

    if cfg.task == "q":
        _fill_q_encoder(sd, ref_enc, head, enc_cfg, report)
    else:
        _fill_lxrt(sd, ref_enc, head["lxrt"], enc_cfg, cat, report)

    if "hgq_encoder" in head:
        hq = "hgq_encoder"
        hgq: Dict[str, Any] = {
            "act_token": sd[f"{hq}.act_token"],
            "rel_token": sd[f"{hq}.rel_token"],
            "cls_token": sd[f"{hq}.cls_token"],
        }
        for k in ("x_tied", *(f"x_{i}" for i in range(enc_cfg.x_layers))):
            if k in head[hq]:
                hgq[k] = None
        _x_layer_tree(sd, lambda i: f"{hq}.cross_attn_layer.{cat}",
                      hgq, cat, enc_cfg.x_layers)
        pool_key = "dense2" if cat == "cross" else "dense"
        hgq["pooler"] = {pool_key: _dense(
            sd, f"{hq}.pooler_dict.{cat}.{pool_key}")}
        _strict_merge(head[hq], hgq, hq, report)

    for name in ("relation_query_embed", "action_query_embed"):
        if name in head and f"{name}.word_embeddings.weight" in sd:
            _strict_merge(head[name], _hg_embeddings(sd, name), name, report)

    for name in ("rel_decoder", "action_decoder"):
        if name in head and f"{name}.layers.0.linear1.weight" in sd:
            tree = {f"layer_{i}": _decoder_layer(sd, f"{name}.layers.{i}")
                    for i in range(cfg.decoder.num_layers)}
            _strict_merge(head[name], tree, name, report)

    for ours, ref in (("class_embed", "class_embed"),
                      ("action_embed", "action_embed"),
                      ("logit_fc", "logit_fc"),
                      ("logit_fc2", "logit_fc2")):
        if ours in head and (f"{ref}.0.weight" in sd or f"{ref}.weight" in sd):
            _strict_merge(head[ours],
                          _mlp_head(sd, ref, cfg.decoder.linear_cls),
                          ours, report)

    if "backbone" in params:
        bb = _convert_backbone(sd, cfg.backbone)
        if bb:
            _strict_merge(params["backbone"], bb["params"],
                          "backbone", report)
            if bb.get("batch_stats"):
                _strict_merge(
                    variables.setdefault("batch_stats", {})
                    .setdefault("backbone", {}),
                    bb["batch_stats"], "backbone/batch_stats", report,
                    allow_new=True)
        else:
            report["skipped"].append(
                "backbone (no vid_encoder.backbone.* keys in checkpoint)")

    return variables, report


def _fill_lxrt(sd, ref_enc: str, lxrt: Dict[str, Any], enc_cfg, cat: str,
               report) -> None:
    n_vis = enc_cfg.visual_seq_length
    tree: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {
                "embedding": sd[f"{ref_enc}.embeddings.word_embeddings"
                                ".weight"]},
            "position_embeddings": {
                "embedding": sd[f"{ref_enc}.embeddings.position_embeddings"
                                ".weight"]},
            "token_type_embeddings": {
                "embedding": sd[f"{ref_enc}.embeddings.token_type_embeddings"
                                ".weight"]},
            "ln": _ln(sd, f"{ref_enc}.embeddings.LayerNorm"),
        },
    }
    enc: Dict[str, Any] = {}
    if f"{ref_enc}.encoder.visn_fc.conv.1.weight" in sd:
        enc["visual_tokenizer"] = {
            "conv1": {
                "kernel": sd[f"{ref_enc}.encoder.visn_fc.conv.1.weight"]
                .transpose(2, 3, 4, 1, 0),
                "bias": sd[f"{ref_enc}.encoder.visn_fc.conv.1.bias"]},
            "conv2": {
                "kernel": sd[f"{ref_enc}.encoder.visn_fc.conv.4.weight"]
                .transpose(2, 3, 4, 1, 0),
                "bias": sd[f"{ref_enc}.encoder.visn_fc.conv.4.bias"]},
            "cls_token": sd[f"{ref_enc}.encoder.visn_fc.cls_token"],
            "pos_embedding": sd[
                f"{ref_enc}.encoder.visn_fc.position_encoding.pe.weight"
            ][:n_vis],
        }
    for i in range(enc_cfg.l_layers):
        enc[f"l_{i}"] = _bert_layer(sd, f"{ref_enc}.encoder.layer.{i}")
    for i in range(enc_cfg.r_layers):
        if f"{ref_enc}.encoder.r_layers.{i}.attention.self.query.weight" in sd:
            enc[f"r_{i}"] = _bert_layer(sd, f"{ref_enc}.encoder.r_layers.{i}")
    for k in ("x_tied", *(f"x_{i}" for i in range(enc_cfg.x_layers))):
        if k in lxrt.get("encoder", {}):
            enc[k] = None
    _x_layer_tree(sd, lambda i: f"{ref_enc}.encoder.x_layers.{i}",
                  enc, cat, enc_cfg.x_layers)
    tree["encoder"] = enc
    pool_key = "dense2" if cat == "cross" else "dense"
    tree["pooler"] = {pool_key: _dense(
        sd, f"{ref_enc}.pooler_dict.{cat}.{pool_key}")}
    _strict_merge(lxrt, tree, "lxrt", report)


def _fill_q_encoder(sd, ref_enc: str, head: Dict[str, Any], enc_cfg,
                    report) -> None:
    """taskQ: our LanguageEncoder ('bert_encoder': embeddings + l_{i} +
    single-CLS pooler) from the reference's BertFeatureExtraction
    (modeling_capsbert.py:2310-2417)."""
    be = head["bert_encoder"]
    tree: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {
                "embedding": sd[f"{ref_enc}.embeddings.word_embeddings"
                                ".weight"]},
            "position_embeddings": {
                "embedding": sd[f"{ref_enc}.embeddings.position_embeddings"
                                ".weight"]},
            "token_type_embeddings": {
                "embedding": sd[f"{ref_enc}.embeddings.token_type_embeddings"
                                ".weight"]},
            "ln": _ln(sd, f"{ref_enc}.embeddings.LayerNorm"),
        },
    }
    for i in range(enc_cfg.l_layers):
        tree[f"l_{i}"] = _bert_layer(sd, f"{ref_enc}.encoder.layer.{i}")
    if f"{ref_enc}.pooler.dense.weight" in sd:
        tree["pooler"] = {"dense": _dense(sd, f"{ref_enc}.pooler.dense")}
    elif f"{ref_enc}.pooler_dict.self.dense.weight" in sd:
        tree["pooler"] = {"dense": _dense(
            sd, f"{ref_enc}.pooler_dict.self.dense")}
    _strict_merge(be, tree, "bert_encoder", report)


def _strict_merge(dst: Dict[str, Any], src: Dict[str, Any], path: str,
                  report, allow_new: bool = False) -> None:
    """Overwrite dst leaves from src; unknown keys or shape mismatches are
    errors (a trained checkpoint must match the configured model exactly,
    like the reference's strict=True load, agqaHGQA.py:870)."""
    for key, val in src.items():
        here = f"{path}/{key}"
        if val is None:
            continue
        if key not in dst:
            if allow_new:
                dst[key] = val
                continue
            raise KeyError(f"{here}: not in model params — config/topology "
                           "mismatch with the checkpoint")
        if isinstance(val, dict) and isinstance(dst[key], dict):
            _strict_merge(dst[key], val, here, report, allow_new)
            continue
        want, got = tuple(np.shape(dst[key])), tuple(np.shape(val))
        if want != got:
            raise ValueError(
                f"{here}: checkpoint shape {got} vs model {want} — wrong "
                "dims/flags for this checkpoint")
        dst[key] = np.asarray(val, dtype=np.asarray(dst[key]).dtype)
        report["mapped"].append(here)


def _np_tree(tree):
    if isinstance(tree, dict):
        return {k: _np_tree(v) for k, v in tree.items()}
    return np.asarray(tree)
