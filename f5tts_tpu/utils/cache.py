"""Persistent XLA compilation cache.

First compile of the 32-step sampler is minutes through the remote-compile
tunnel; the on-disk cache brings warm starts down to seconds. Enabled by the
bench harness and the CLIs; set ``F5TPU_COMPILE_CACHE=''`` to disable.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    import jax

    path = path if path is not None else os.environ.get("F5TPU_COMPILE_CACHE", _DEFAULT)
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:
        return None
