"""Import pretrained torch BERT weights into the flax encoder params.

The reference's default (non ``--fromScratch``) path loads bert-base-uncased
into its LXRT model by torch name matching
(``modeling_capsbert.py:1654-1785`` ``BertPreTrainedModel.from_pretrained``):
the ``bert.`` prefix is stripped, legacy ``gamma``/``beta`` LayerNorm names
are renamed to ``weight``/``bias``, and every parameter whose (renamed) name
exists in the model is overwritten -- in practice the text embeddings, the
language-stream ``encoder.layer.{i}`` BertLayers, and ``pooler.dense`` for
the single-CLS pooler variants.  The visual stream, cross layers, conv
tokenizer, and BertPooler2 (``dense2``) keep their scratch init.

This module reproduces exactly that partial-overwrite onto our flax param
trees (``LXRTModel`` / ``LanguageEncoder`` subtrees) from a
``pytorch_model.bin`` state_dict, with the torch->flax layout conventions
(Linear weights transposed, conv kernels to NDHWC, LayerNorm weight->scale).

No torch dependency at call time beyond loading the checkpoint file; a
pre-loaded ``{name: np.ndarray}`` dict works too (and ``.npz`` files).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint file into {name: np.ndarray}.

    Accepts a torch ``pytorch_model.bin`` (needs torch importable) or an
    ``.npz`` with the same key names.
    """
    if str(path).endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def normalize_bert_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference key canonicalization (modeling_capsbert.py:1741-1753 +
    start_prefix logic at :1771-1773): gamma->weight, beta->bias, and strip
    a leading ``bert.`` when present."""
    out: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        if "gamma" in key:
            key = key.replace("gamma", "weight")
        if "beta" in key:
            key = key.replace("beta", "bias")
        if key.startswith("bert."):
            key = key[len("bert."):]
        out[key] = np.asarray(val)
    return out


def _dense(sd, prefix):
    return {"Dense_0": {"kernel": sd[f"{prefix}.weight"].T,
                        "bias": sd[f"{prefix}.bias"]}}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _bert_layer(sd, prefix):
    """torch BertLayer state_dict slice -> our models/layers.BertLayer tree."""
    return {
        "attention": {
            "self": {
                "query": _dense(sd, f"{prefix}.attention.self.query"),
                "key": _dense(sd, f"{prefix}.attention.self.key"),
                "value": _dense(sd, f"{prefix}.attention.self.value"),
            },
            "output": {
                "dense": _dense(sd, f"{prefix}.attention.output.dense"),
                "ln": _ln(sd, f"{prefix}.attention.output.LayerNorm"),
            },
        },
        "ffn": {
            "intermediate": _dense(sd, f"{prefix}.intermediate.dense"),
            "output": _dense(sd, f"{prefix}.output.dense"),
            "ln": _ln(sd, f"{prefix}.output.LayerNorm"),
        },
    }


def _merge(dst: Dict[str, Any], src: Dict[str, Any], path: str,
           loaded: List[str], skipped: List[str]) -> None:
    """Overwrite dst leaves from src where names AND shapes match."""
    for key, val in src.items():
        here = f"{path}/{key}" if path else key
        if key not in dst:
            skipped.append(f"{here} (not in model)")
            continue
        if isinstance(val, dict):
            _merge(dst[key], val, here, loaded, skipped)
            continue
        cur = dst[key]
        if tuple(np.shape(cur)) != tuple(np.shape(val)):
            skipped.append(
                f"{here} (shape {np.shape(val)} vs model {np.shape(cur)})")
            continue
        dst[key] = np.asarray(val, dtype=np.asarray(cur).dtype)
        loaded.append(here)


def bert_to_lxrt_params(
    sd: Dict[str, np.ndarray],
    lxrt_params: Dict[str, Any],
    num_layers: int | None = None,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Partial-overwrite an LXRTModel (or LanguageEncoder) param subtree with
    bert weights; returns (new_params, {"loaded": [...], "skipped": [...]})

    Mirrors reference from_pretrained: language embeddings + as many
    ``encoder.layer.{i}`` -> ``encoder/l_{i}`` as both sides have, plus
    ``pooler.dense`` when the model's pooler is the single-CLS variant
    (BertPooler; BertPooler2's ``dense2`` never matches bert's ``dense``).
    Visual/cross subtrees are untouched.  Scanned (lax.scan-stacked) encoder
    params are not supported -- convert with scan_layers=False and reshape,
    or load before enabling scan.
    """
    sd = normalize_bert_keys(sd)
    params = copy.deepcopy(
        {k: _to_numpy_tree(v) for k, v in lxrt_params.items()})
    loaded: List[str] = []
    skipped: List[str] = []

    src: Dict[str, Any] = {}
    if "embeddings.word_embeddings.weight" in sd:
        src["embeddings"] = {
            "word_embeddings": {
                "embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {
                "embedding": sd["embeddings.token_type_embeddings.weight"]},
            "ln": _ln(sd, "embeddings.LayerNorm"),
        }

    # our unscanned stacks name language layers l_{i} both in LXRTModel
    # ("encoder" subtree) and LanguageEncoder (top level)
    enc_dst = params.get("encoder", params)
    n_avail = 0
    while f"encoder.layer.{n_avail}.attention.self.query.weight" in sd:
        n_avail += 1
    n_model = 0
    while f"l_{n_model}" in enc_dst:
        n_model += 1
    if "l_stack" in enc_dst or "l_stack" in params:
        skipped.append("l_stack (scanned stacks unsupported; convert with "
                       "scan_layers=False)")
    n = min(n_avail, n_model) if num_layers is None \
        else min(num_layers, n_avail, n_model)
    enc_src = {f"l_{i}": _bert_layer(sd, f"encoder.layer.{i}")
               for i in range(n)}
    if "encoder" in params:
        src["encoder"] = enc_src
    else:
        src.update(enc_src)

    if "pooler.dense.weight" in sd:
        src["pooler"] = {"dense": _dense(sd, "pooler.dense")}

    _merge(params, src, "", loaded, skipped)
    return params, {"loaded": loaded, "skipped": skipped}


def vit_block_params(sd: Dict[str, np.ndarray], prefix: str
                     ) -> Dict[str, Any]:
    """One timm ViT ``blocks.{i}`` state_dict slice -> models/vit.ViTBlock
    params (norm1/qkv/proj/norm2/fc1/fc2; torch Linear weights transposed)."""
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "qkv": {"kernel": sd[f"{prefix}.attn.qkv.weight"].T,
                "bias": sd[f"{prefix}.attn.qkv.bias"]},
        "proj": {"kernel": sd[f"{prefix}.attn.proj.weight"].T,
                 "bias": sd[f"{prefix}.attn.proj.bias"]},
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "fc1": {"kernel": sd[f"{prefix}.mlp.fc1.weight"].T,
                "bias": sd[f"{prefix}.mlp.fc1.bias"]},
        "fc2": {"kernel": sd[f"{prefix}.mlp.fc2.weight"].T,
                "bias": sd[f"{prefix}.mlp.fc2.bias"]},
    }


def vit_to_r_layers(
    sd: Dict[str, np.ndarray],
    num_layers: int,
    start_index: int = 0,
) -> Dict[str, Any]:
    """timm ``vit_base_patch32_224`` state_dict -> {"r_0": ..., "r_{n-1}"}
    ViTBlock param trees, taking ``blocks[start_index:start_index+n]``
    exactly like the reference's ``load_vit_layers``
    (``modeling_capsbert.py:1377-1390``, --startIndex default 7 so 5
    r-layers get the LAST 5 ViT blocks)."""
    n_avail = 0
    while f"blocks.{n_avail}.norm1.weight" in sd:
        n_avail += 1
    if num_layers + start_index > n_avail:
        raise ValueError(
            f"cannot take {num_layers} blocks from index {start_index}: "
            f"checkpoint has {n_avail} (reference assert, "
            f"modeling_capsbert.py:1383-1385)")
    return {f"r_{i}": vit_block_params(sd, f"blocks.{start_index + i}")
            for i in range(num_layers)}


def _to_numpy_tree(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy_tree(v) for k, v in tree.items()}
    return np.asarray(tree)
