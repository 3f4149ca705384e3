"""Persistent XLA compilation cache.

The full registration program takes ~100 s to compile on the TPU; without a
persistent cache every fresh process pays it (bench.py, eval runs, scripts).
One call to :func:`enable_compilation_cache` amortizes that across
processes.  Safe to call multiple times; silently degrades to a no-op if the
jax version lacks the config knobs.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "BUFFER_TPU_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))


def enable_compilation_cache(cache_dir: str = None) -> bool:
    """Point jax's persistent compilation cache at ``cache_dir``
    (default: <repo>/.jax_cache).  Returns True if enabled."""
    import jax

    cache_dir = cache_dir or DEFAULT_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: the eval harness jits several small
        # helpers alongside the ~100 s registration program
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:
            pass
        return True
    except Exception:
        return False
