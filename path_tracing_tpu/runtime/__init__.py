"""Runtime utilities shared by all front-ends."""
from __future__ import annotations

import os


def setup_jax_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compile cache.

    The scan-heavy integrator programs take minutes to compile cold (on the
    tunneled TPU and on this 1-core CPU alike); the cache makes every
    subsequent process start in milliseconds.
    """
    import jax

    cache = path or os.environ.get(
        "PT_TPU_CACHE", os.path.expanduser("~/.cache/jax_pt_tpu"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
