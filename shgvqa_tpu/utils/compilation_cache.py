"""Persistent XLA compilation cache.

First compiles of the full video training step take many minutes on the
remote-compile TPU path; the cache makes every later process start hot.
Enabled by the drivers, bench, and graft entry.  Override the location with
SHGVQA_COMPILE_CACHE; disable with SHGVQA_COMPILE_CACHE=off.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "shgvqa_tpu", "xla_cache")


def enable_compilation_cache() -> str | None:
    where = os.environ.get("SHGVQA_COMPILE_CACHE", _DEFAULT)
    if where == "off":
        return None
    import jax

    os.makedirs(where, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", where)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"compilation cache unavailable: {e}", flush=True)
        return None
    return where
