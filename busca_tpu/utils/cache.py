"""Persistent XLA compilation cache for the production CLIs.

The reference caches its one-time detector conversion as a TRT engine file
(tools/track.py:215-224); the JAX-native equivalent for the *live* path is
the persistent compilation cache — first `busca-track`/`busca-serve` run
compiles (~20-40 s for YOLOX-X), every later process start loads the
compiled executable from disk.  bench.py and tests/conftest.py already use
it; this helper wires the same cache into the CLIs.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a durable directory.

    Resolution order: explicit ``path`` > ``BUSCA_JAX_CACHE`` env var >
    ``~/.cache/busca_tpu/jax_cache``.  Set ``BUSCA_JAX_CACHE=0`` to disable.
    Call before the first compilation; returns the cache dir (or None when
    disabled or unwritable — the cache is an optimization, never a hard
    dependency).
    """
    env = os.environ.get("BUSCA_JAX_CACHE")
    if env == "0":
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current and path is None:
        # already configured (tests/bench point at the repo-local cache);
        # never override an explicit setting
        return current
    path = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "busca_tpu", "jax_cache"
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
