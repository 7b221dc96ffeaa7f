"""Multi-host initialization.

The reference has no multi-node story (no torch.distributed anywhere,
SURVEY.md §2.6).  TPU-natively, multi-host data parallelism is the same
pjit program spanning hosts: call ``maybe_initialize_distributed()`` before
any jax use; with coordinator env vars set (or explicit args) it brings up
the DCN-coordinated runtime and ``jax.devices()`` becomes the global device
set.  Single-host runs are a no-op.

Env contract (standard jax.distributed):
  SHGVQA_COORDINATOR=host:port  SHGVQA_NUM_PROCESSES=N  SHGVQA_PROCESS_ID=i
(or the TPU pod runtime's automatic detection when no args are given).
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when configured; returns True if
    multi-host mode is active."""
    coordinator_address = coordinator_address or os.environ.get(
        "SHGVQA_COORDINATOR")
    if num_processes is None and "SHGVQA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SHGVQA_NUM_PROCESSES"])
    if process_id is None and "SHGVQA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SHGVQA_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_batch_slice(global_batch_size: int,
                        index: Optional[int] = None,
                        count: Optional[int] = None) -> slice:
    """Each host feeds its shard of the global batch; with B hosts and batch
    G, host i owns rows [i*G/B, (i+1)*G/B).  The product Batcher materializes
    ONLY these rows per host (``data/pipeline.py``).

    Raises on non-divisible sizes instead of silently truncating -- pjit
    global-array construction needs equal per-host shards; pad the global
    batch first (``pad_to_multiple``)."""
    if count is None or index is None:
        import jax

        count = jax.process_count() if count is None else count
        index = jax.process_index() if index is None else index
    if global_batch_size % count != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{count} processes; pad with pad_to_multiple() first")
    per = global_batch_size // count
    return slice(index * per, (index + 1) * per)


def allgather_object(obj):
    """All-gather a small JSON-serializable object across processes; every
    process returns the list ``[obj_from_process_0, ..., obj_from_P-1]``.

    Used to merge per-host prediction maps after a multi-host eval pass
    (each host scores only the batch rows it fed; the evaluators need the
    full split).  Rides jax's own collectives — no extra transport."""
    import json as _json

    import jax
    import numpy as _np

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    blob = _np.frombuffer(_json.dumps(obj).encode("utf-8"), _np.uint8)
    sizes = _np.asarray(multihost_utils.process_allgather(
        _np.asarray([blob.size], _np.int32))).reshape(-1)
    padded = _np.zeros((int(sizes.max()),), _np.uint8)
    padded[:blob.size] = blob
    datas = _np.asarray(multihost_utils.process_allgather(padded))
    return [
        _json.loads(bytes(datas[i, :int(sizes[i])]).decode("utf-8"))
        for i in range(datas.shape[0])
    ]


def pad_to_multiple(batch_size: int, n: Optional[int] = None) -> int:
    """Smallest batch size >= batch_size divisible by the process count."""
    import jax

    n = n or jax.process_count()
    return ((batch_size + n - 1) // n) * n
