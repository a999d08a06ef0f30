"""Persistent XLA compilation cache setup.

First compiles through the TPU tunnel are slow (minutes for the perception
graphs); the persistent cache turns warm restarts into sub-second loads.

The cache is ONLY enabled for accelerator backends: CPU compiles are fast,
and serializing large CPU executables for the cache can hard-abort the
process inside `executable.serialize()` (observed: the fused
perception+tracking program compiled on the tests' forced-CPU backend took
the whole pytest run down from a cache write triggered by a demo entry
point that had enabled the cache process-wide).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    import jax

    if jax.default_backend() == "cpu":
        return None
    d = cache_dir or os.environ.get("VIDO_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
