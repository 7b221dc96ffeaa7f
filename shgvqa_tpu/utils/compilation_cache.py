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
    """Persistent cache for TPU backends; DISABLED on the CPU backend.

    Measured this round (round-5 notes): XLA:CPU AOT cache artifacts are
    rejected at load time even on the SAME host and jax build — the compile
    step records tuning pseudo-features (``+prefer-no-scatter``,
    ``+prefer-no-gather``) in the artifact's machine-feature list, and the
    loader's host-feature probe never reports them, so every lookup fails
    ``cpu_aot_loader.cc:210`` and pays a rejected load plus the full cold
    compile anyway (the MULTICHIP_r04 log spam; reproduced with a 2-process
    same-host probe).  The cache is therefore pure overhead under
    ``JAX_PLATFORMS=cpu``; SHGVQA_CPU_CACHE=1 re-enables it if a future
    jaxlib fixes the feature check."""
    if (os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"
            and os.environ.get("SHGVQA_CPU_CACHE", "0") != "1"):
        return None
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
