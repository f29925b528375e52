"""Persistent XLA compilation cache setup.

The reference pays a fresh CUDA-graph/torch compile per process; under XLA
the equivalent cost is the jit compile of each (model, batch-shape) pair —
~10 minutes for published-size GemNet-OC relaxation through the TPU tunnel.
JAX can persist compiled executables to disk keyed by HLO + compiler flags,
so every process after the first loads them in seconds.  This module turns
that on with sane defaults; it has no reference counterpart (the capability
does not exist in the reference stack).

Resolution order for the cache directory:

1. explicit ``path`` argument (config key ``compilation_cache_dir``),
2. ``$ADSORBDIFF_TPU_COMPILE_CACHE``,
3. ``~/.cache/adsorbdiff_tpu/xla``.

Pass ``path=""``/``compilation_cache_dir: ""`` to disable.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

_DONE = False


def setup_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable the persistent compilation cache; returns the directory used
    (None when disabled).  Idempotent; safe to call before or after backend
    initialization (the config flags are read at compile time)."""
    global _DONE
    if path == "":
        return None
    if path is None:
        path = os.environ.get("ADSORBDIFF_TPU_COMPILE_CACHE") or os.path.expanduser(
            "~/.cache/adsorbdiff_tpu/xla"
        )
    if _DONE:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache anything that took >=2 s to compile — the tiny jits aren't worth
    # the disk round-trip, the model-scale ones absolutely are
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True
    logging.info(f"persistent compilation cache at {path}")
    return path
