"""Batching + host->device pipeline.

The reference reaches throughput with 8 DataLoader worker processes, pinned
memory, prefetch 2 (``agqaHGQA.py:55-60``).  The TPU-native shape: per-item
featurization is cheap vectorized numpy (tokenization done once up front),
batches are stacked contiguously, and a background thread keeps ``prefetch``
batches in flight so the device never waits on the host
(jax dispatch overlaps the transfer with compute).

Batches keep STATIC shapes: the last partial batch is padded up to
``batch_size`` and carries ``n_valid`` so eval can drop pad rows
(the reference instead silently drops the tail via drop_last=True — we keep
every example and still never recompile).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np


def stack_items(items: List[Dict], pad_to: Optional[int] = None) -> Dict:
    """Stack per-item dicts; non-array fields (e.g. ques_id) become lists.
    Pads with repeats of the last item up to ``pad_to`` and records
    ``n_valid``."""
    n = len(items)
    if pad_to is not None and n < pad_to:
        items = items + [items[-1]] * (pad_to - n)
    out: Dict = {}
    for k in items[0]:
        v0 = items[0][k]
        numeric_scalar = np.isscalar(v0) and not isinstance(v0, (str, bytes))
        if isinstance(v0, np.ndarray) or numeric_scalar:
            out[k] = np.stack([np.asarray(it[k]) for it in items], axis=0)
        else:
            out[k] = [it[k] for it in items]
    out["n_valid"] = n
    return out


class Batcher:
    """Deterministic shuffled batching over an indexable item source."""

    def __init__(
        self,
        items: Callable[[int], Dict] | List[Dict],
        num_items: Optional[int] = None,
        batch_size: int = 8,
        shuffle: bool = True,
        drop_last: bool = False,
        pad_last: bool = True,
        seed: int = 9595,
        host_shard: Optional[tuple] = None,
    ):
        """host_shard=(process_index, process_count): multi-host mode — the
        shuffle order and batch boundaries are GLOBAL (identical on every
        host, same seed), but each host materializes/decodes only its own
        rows of every batch (``parallel/distributed.process_batch_slice``)
        and yields a LOCAL batch with a host-local ``n_valid``; the mesh
        layer reassembles the global array from the per-process shards
        (``parallel/mesh.shard_batch``)."""
        if hasattr(items, "__getitem__"):
            self._get = items.__getitem__
            self.num_items = num_items if num_items is not None else len(items)
        else:
            self._get = items
            assert num_items is not None
            self.num_items = num_items
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.seed = seed
        self.host_shard = host_shard
        if host_shard is not None:
            idx, cnt = host_shard
            if batch_size % cnt:
                raise ValueError(
                    f"batch size {batch_size} not divisible by "
                    f"{cnt} processes")
            if not pad_last and not drop_last:
                raise ValueError(
                    "host-sharded batching needs pad_last (every host must "
                    "contribute equal rows to the trailing batch)")

    def __len__(self) -> int:
        if self.drop_last:
            return self.num_items // self.batch_size
        return -(-self.num_items // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict]:
        order = np.arange(self.num_items)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        bs = self.batch_size
        for start in range(0, self.num_items, bs):
            chunk = order[start : start + bs]
            if len(chunk) < bs and self.drop_last:
                return
            if self.host_shard is None:
                items = [self._get(int(i)) for i in chunk]
                yield stack_items(items,
                                  pad_to=bs if self.pad_last else None)
                continue
            from shgvqa_tpu.parallel.distributed import process_batch_slice

            idx, cnt = self.host_shard
            n = len(chunk)
            if n < bs:
                # global padding (repeat the last valid item) BEFORE
                # slicing: the padded global batch is identical to the
                # single-process one, so per-row predictions match exactly
                chunk = np.concatenate(
                    [chunk, np.full(bs - n, chunk[-1], chunk.dtype)])
            sl = process_batch_slice(bs, index=idx, count=cnt)
            items = [self._get(int(i)) for i in chunk[sl]]
            batch = stack_items(items)
            per = bs // cnt
            batch["n_valid"] = int(np.clip(n - idx * per, 0, per))
            yield batch


def device_put_batches(iterator: Iterable[Dict]) -> Iterator[Dict]:
    """Transfer each batch's arrays to the default device, leaving non-array
    fields (ques_id lists, n_valid) on host.  Compose INSIDE prefetch() so
    host->device transfers overlap compute — critical on relay-attached TPUs
    where h2d bandwidth is ~100MB/s."""
    import jax

    for batch in iterator:
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                out[k] = jax.device_put(v)
            else:
                out[k] = v
        yield out


def prefetch(iterator: Iterable[Dict], depth: int = 2,
             to_device: bool = True) -> Iterator[Dict]:
    """Run the upstream iterator in a thread, keeping ``depth`` batches
    ready; with ``to_device`` the thread also stages arrays on the
    accelerator so transfers overlap compute."""
    if to_device:
        iterator = device_put_batches(iterator)
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: List[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
