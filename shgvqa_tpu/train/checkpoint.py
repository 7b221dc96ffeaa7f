"""Checkpointing with the reference's CURRENT/BEST/LAST semantics.

The reference saves raw ``state_dict`` files ``{output}/CURRENT.pth`` each
epoch, ``BEST.pth`` keyed on hypergraph-head validation accuracy, ``LAST.pth``
at exit (``agqaHGQA.py:405,419,455,859-861``) — and notably does NOT persist
optimizer state, so resume restarts momentum/schedule.

Here: orbax checkpoints that DO include opt_state + step + best score
(preemption-safe resume), under the same three names.  ``restore`` accepts
either name or a full path, mirroring ``--load path/BEST`` (no extension).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

CHECKPOINT_NAMES = ("CURRENT", "BEST", "LAST")


class CheckpointManager:
    def __init__(self, output_dir: str):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def path(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def save(self, name: str, state: Any) -> None:
        # device_get first: the state is replicated under data parallelism
        # (flat state / dp params), so every process holds the full host
        # value.  Multi-process: EVERY process must enter orbax's save —
        # it carries its own cross-process barriers
        # (Checkpointer:save_start), and its type handlers write host/numpy
        # data from the primary host only, so there is exactly one writer.
        state = jax.device_get(state)
        self._ckptr.save(self.path(name), state, force=True)

    def restore(self, name_or_path: str, template: Optional[Any] = None) -> Any:
        path = (
            self.path(name_or_path)
            if name_or_path in CHECKPOINT_NAMES
            else os.path.abspath(name_or_path)
        )
        if template is not None:
            restore_args = ocp.checkpoint_utils.construct_restore_args(template)
            return self._ckptr.restore(
                path, restore_args=restore_args, item=template
            )
        return self._ckptr.restore(path)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))
