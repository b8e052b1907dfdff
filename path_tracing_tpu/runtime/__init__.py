"""Runtime utilities shared by all front-ends."""
from __future__ import annotations

import os


def setup_jax_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compile cache, and apply any CPU-platform
    request *in-process*.

    The scan-heavy integrator programs take minutes to compile cold (on the
    tunneled TPU and on this 1-core CPU alike); the cache makes every
    subsequent process start in milliseconds.

    The platform part is a liveness defense: when the TPU is wedged (a
    killed client's grant lingering on the remote side), backend discovery
    *hangs* — even under ``JAX_PLATFORMS=cpu`` / ``JAX_PLATFORM_NAME=cpu``,
    because the axon plugin still initializes against the tunnel.  Only
    ``jax.config.update("jax_platforms", "cpu")`` *before first backend
    use* skips the plugin entirely (measured: both env forms hang, the
    config form returns CpuDevice immediately).  Every CPU-forcing caller
    (CLI tests, ``dryrun_multichip``'s child) relies on this translation.
    """
    import jax

    # A cpu request in EITHER variable wins: this environment exports an
    # ambient ``JAX_PLATFORMS=axon``, so ``JAX_PLATFORM_NAME=cpu pt-tpu ...``
    # must not be masked by it (it was — the CLI then initialized the axon
    # plugin, which HANGS whenever the TPU is wedged).
    vals = {os.environ.get("JAX_PLATFORMS", "").strip().lower(),
            os.environ.get("JAX_PLATFORM_NAME", "").strip().lower()}
    if "cpu" in vals:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # backends already initialized — nothing to save
            pass
    cache = path or os.environ.get(
        "PT_TPU_CACHE", os.path.expanduser("~/.cache/jax_pt_tpu"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
