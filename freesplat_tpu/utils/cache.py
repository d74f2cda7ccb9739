"""Persistent XLA compilation cache helper.

The axon TPU environment compiles remotely (~minutes per new graph);
persisting compiled executables across processes turns repeat runs into
cache hits.  Call ``enable_compilation_cache()`` before the first jit.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "FREESPLAT_COMPILATION_CACHE", "/root/.jax_cache"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: not fatal
