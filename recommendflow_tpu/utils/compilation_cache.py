"""Persistent XLA compilation cache for the CLIs and benches.

First full-model compiles cost 20-40 s at batch 1024 and 150-216 s at
batch 2048-4096 on the tunneled v5e (PERF.md §2b); the persistent cache
cuts warm-process compiles to seconds (measured 2026-08-21 on the bench
two-tower: first step 18.7 -> 2.7 s, scan-8 dispatch 18.3 -> 1.7 s,
~16 MB on disk). Called by the CLI entry points and bench.py — never at
library import (a library must not mutate global jax config on import).

Env knobs:
    RECFLOW_XLA_CACHE=0       disable
    RECFLOW_XLA_CACHE=<dir>   cache directory (default
                              ~/.cache/recommendflow_tpu/xla)
A user-set JAX_COMPILATION_CACHE_DIR (jax's own knob) wins: we only
configure the cache when jax has none.
"""
from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Turn on jax's persistent compilation cache; returns the directory
    used, or None when disabled / already user-configured."""
    env = os.environ.get("RECFLOW_XLA_CACHE")
    if env == "0":
        return None
    import jax

    current = getattr(jax.config, "jax_compilation_cache_dir", None)
    if current:
        return None  # respect the user's own jax configuration
    path = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "recommendflow_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took >=1 s to compile (default 60 s would
        # skip most of the model-sized programs this exists for)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None  # cache is an optimization — never fail a run over it
    return path
