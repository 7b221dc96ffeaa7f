"""Structured metrics + profiling.

The reference logs with bare ``print(..., flush=True)`` every --logFreq steps
and appends to ``{output}/log.log`` on STAR (``star.py:385-387``); no
profiler is active (``agqaHGQA.py:45-47`` explicitly disables torch's).

Here: a JSONL metric writer (one line per logged step — machine-readable,
cheap) plus stdout mirroring, and optional ``jax.profiler`` trace capture
every N steps for Perfetto/XProf inspection (SURVEY.md §5 rebuild note).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, output_dir: str, filename: str = "metrics.jsonl",
                 also_log_file: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self._f = open(self.path, "a", buffering=1)
        self.log_path = os.path.join(output_dir, "log.log")
        self._log = (
            open(self.log_path, "a", buffering=1) if also_log_file else None
        )

    def write(self, step: int, metrics: Dict[str, float], **extra) -> None:
        rec = {"step": step, "time": time.time(), **metrics, **extra}
        self._f.write(json.dumps(rec) + "\n")

    def log(self, msg: str) -> None:
        print(msg, flush=True)
        if self._log is not None:
            self._log.write(msg + "\n")

    def close(self) -> None:
        self._f.close()
        if self._log is not None:
            self._log.close()


class Profiler:
    """Capture a jax.profiler trace for ``trace_steps`` steps starting at
    ``start_step``; writes to ``{output}/profile``."""

    def __init__(self, output_dir: str, start_step: int = 10,
                 trace_steps: int = 5, enabled: bool = False):
        self.dir = os.path.join(output_dir, "profile")
        self.start_step = start_step
        self.stop_step = start_step + trace_steps
        self.enabled = enabled
        self._active = False

    def step(self, step: int) -> None:
        if not self.enabled:
            return
        import jax

        if step == self.start_step and not self._active:
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
            self.enabled = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
