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


def process_batch_slice(global_batch_size: int) -> slice:
    """Each host feeds its shard of the global batch; with B hosts and batch
    G, host i owns rows [i*G/B, (i+1)*G/B).

    Raises on non-divisible sizes instead of silently truncating -- pjit
    global-array construction needs equal per-host shards; pad the global
    batch first (``pad_to_multiple``)."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes; pad with pad_to_multiple() first")
    per = global_batch_size // n
    return slice(i * per, (i + 1) * per)


def pad_to_multiple(batch_size: int, n: Optional[int] = None) -> int:
    """Smallest batch size >= batch_size divisible by the process count."""
    import jax

    n = n or jax.process_count()
    return ((batch_size + n - 1) // n) * n
