"""Device mesh + sharding layout.

The reference's entire parallelism story is single-process
``nn.DataParallel`` over <=2 local GPUs (``agqaHGQA.py:124-129``) — replicate
params, scatter the batch, gather outputs, all over PCIe.  The TPU-native
equivalent is one jitted SPMD program over a ``jax.sharding.Mesh``:

- ``data`` axis: batch-dim sharding; XLA emits the gradient all-reduce over
  ICI automatically (no NCCL analog needed);
- ``model`` axis: optional tensor parallelism — attention/FFN kernels are
  sharded head-/column-wise so each step's matmuls stay MXU-sized per chip and
  the activations ride reduce-scatter/all-gather on ICI.

The 768-hidden model fits one chip comfortably; TP exists so the same code
scales to bigger encoder configs (and so multi-chip layouts are exercised in
CI on a virtual 8-device CPU mesh).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shgvqa_tpu.configs.config import MeshConfig


def make_mesh(mesh_cfg: Optional[MeshConfig] = None,
              devices=None) -> Mesh:
    mesh_cfg = mesh_cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, mesh_cfg.model_parallel)
    dp = mesh_cfg.data_parallel
    if dp == -1:
        dp = n // mp
    assert dp * mp == n, (
        f"mesh {dp}x{mp} does not cover {n} devices"
    )
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (mesh_cfg.data_axis, mesh_cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter partitioning rules for tensor parallelism: map flattened param
# path regexes -> PartitionSpec.  First match wins; default replicated.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # attention projections: split heads (output features)
    (r".*(query|key|value)/.*kernel$", P(None, "model")),
    (r".*in_proj/kernel$", P(None, "model")),
    # attention output projection: split input features (row-parallel)
    (r".*output/dense/kernel$", P("model", None)),
    (r".*out_proj/.*kernel$", P("model", None)),
    # FFN: column-parallel up, row-parallel down
    (r".*(intermediate|linear1|fc1)/.*kernel$", P(None, "model")),
    (r".*(ffn/output|linear2|fc2)/.*kernel$", P("model", None)),
)


def _spec_for(path: str, model_parallel: bool) -> P:
    if model_parallel:
        for pattern, spec in _TP_RULES:
            if re.match(pattern, path):
                return spec
    return P()


def partition_params(params: Any, mesh: Mesh) -> Any:
    """Returns a pytree of NamedShardings matching ``params``."""
    model_parallel = mesh.shape[mesh.axis_names[1]] > 1

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = []
    for keypath, leaf in flat:
        path = "/".join(_key_str(k) for k in keypath)
        spec = _spec_for(path, model_parallel)
        # only shard if divisible; fall back to replication otherwise
        if spec != P():
            ok = True
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                size = mesh.shape[axis]
                if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                    ok = False
            if not ok:
                spec = P()
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def partition_opt_state(opt_state: Any, params: Any, mesh: Mesh) -> Any:
    """Sharding pytree for an optimizer state: moment leaves follow their
    param's TP sharding, everything else (step counters, empty states)
    replicated.

    Moments live inside wrapper states (chain/multi_transform/BertAdamState)
    whose leaf keypaths END with the param's own path — match by longest
    path suffix with an exact shape check.  Replication is the fallback and
    is always correct (XLA reshards as needed); suffix matching only
    recovers the memory-optimal placement the pre-restore device template
    used to give (advisor round-4 medium finding)."""
    p_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    s_leaves = jax.tree_util.tree_leaves(partition_params(params, mesh))
    table = [
        ("/" + "/".join(_key_str(k) for k in kp),
         tuple(getattr(leaf, "shape", ())), sh)
        for (kp, leaf), sh in zip(p_flat, s_leaves)
    ]
    rep = replicated_sharding(mesh)
    o_flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    out = []
    for kp, leaf in o_flat:
        path = "/" + "/".join(_key_str(k) for k in kp)
        shape = tuple(getattr(leaf, "shape", ()))
        best = None
        for ppath, pshape, sh in table:
            if shape == pshape and path.endswith(ppath):
                if best is None or len(ppath) > len(best[0]):
                    best = (ppath, sh)
        out.append(best[1] if best is not None else rep)
    return jax.tree_util.tree_unflatten(treedef, out)


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis: int = 0) -> Dict[str, Any]:
    """device_put every array batch-sharded along 'data'.  ``axis`` is the
    batch dimension (1 for stacked multi-step chunks whose leading axis is
    the step index).

    Multi-process: the input arrays are this host's LOCAL rows (the Batcher
    materializes only its ``process_batch_slice``), and the global sharded
    array is assembled with ``jax.make_array_from_process_local_data`` —
    no host ever holds the full global batch.  Arrays that are already
    global jax.Arrays (e.g. re-sharding a stacked multi-step chunk) go
    through plain device_put, which reshards in place."""
    bs = NamedSharding(mesh, P(*([None] * axis + [mesh.axis_names[0]])))
    multiproc = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= axis + 1:
            if multiproc and not (
                    isinstance(v, jax.Array)
                    and not v.is_fully_addressable):
                local = np.asarray(v)
                gshape = list(local.shape)
                gshape[axis] *= jax.process_count()
                out[k] = jax.make_array_from_process_local_data(
                    bs, local, tuple(gshape))
            else:
                out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def local_rows(garr) -> np.ndarray:
    """This host's rows of a batch-sharded global array, in global row
    order (deduped across model-axis replicas).  Multi-host eval scoring:
    each host maps its own rows' predictions to its own question ids, then
    the per-host maps are merged (``parallel/distributed.allgather_object``)."""
    if getattr(garr, "is_fully_addressable", True) or getattr(
            garr, "is_fully_replicated", False):
        return np.asarray(garr)
    pieces = {}
    for s in garr.addressable_shards:
        start = s.index[0].start or 0
        if start not in pieces:
            pieces[start] = np.asarray(s.data)
    return np.concatenate([pieces[k] for k in sorted(pieces)], axis=0)


def shard_state(params: Any, opt_state: Any, mesh: Mesh
                ) -> Tuple[Any, Any]:
    """Place params per TP rules; optimizer moments follow their params,
    scalars replicated."""
    p_shard = partition_params(params, mesh)
    params = jax.tree_util.tree_map(jax.device_put, params, p_shard)

    rep = replicated_sharding(mesh)

    def place_opt(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return jax.device_put(leaf, rep)

    # moments have the same tree shape as params inside BertAdamState; a
    # conservative replicated placement is always correct (XLA reshards as
    # needed), and the TP case re-shards m/v lazily on first update.
    opt_state = jax.tree_util.tree_map(place_opt, opt_state)
    return params, opt_state
