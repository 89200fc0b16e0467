"""Persistent XLA compilation cache.

Compiles of the big scanned programs (solver adjoint chains, U-Net
training steps) take minutes on a small host; the persistent cache makes
them one-time per machine. Called by every CLI entry point and the
bench/eval tools; a no-op if the user already configured a cache dir.
"""
import os
from pathlib import Path

_DEFAULT = '~/.cache/red_diffeq_tpu/xla'


def enable_persistent_cache(path: str = None) -> str:
    """Point JAX's compilation cache at a persistent directory and drop
    the minimum-compile-time threshold so even small programs are cached.
    Returns the directory in use."""
    import jax

    cache_dir = (path or os.environ.get('JAX_COMPILATION_CACHE_DIR')
                 or os.path.expanduser(_DEFAULT))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    # Respect a user-set threshold (mirrors the cache-dir handling above);
    # only drop the default so small programs are cached too.
    if 'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS' not in os.environ:
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          0.5)
    return cache_dir
