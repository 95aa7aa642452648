"""Persistent XLA compilation cache setup.

TPU compiles of the fused programs take minutes (especially through remote
compile tunnels); caching them on disk makes every process after the first
start instantly.  Called by bench/CLI entry points; safe to call multiple
times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path=None):
    import jax

    if path is None:
        path = os.environ.get(
            "ISS_JAX_CACHE_DIR",
            os.path.expanduser("~/.cache/inaspeechsegmenter_tpu/jax_cache"))
        # scope per backend: AOT results compiled for one host/feature set
        # can SIGILL when loaded by another (observed warning on CPU)
        path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
