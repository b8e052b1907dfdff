"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are testable without hardware via XLA's host
platform device count (SURVEY.md §4).  NOTE: this environment's axon TPU
plugin ignores ``JAX_PLATFORMS``; ``JAX_PLATFORM_NAME`` is the knob that
actually selects the CPU backend here.  Must be set before JAX initializes,
hence at conftest import time.
"""
import os

# PT_TPU_TESTS_ON_TPU=1 runs the suite against the real chip (used for the
# pallas-equivalence and golden-parity tests, which skip on CPU)
if not os.environ.get("PT_TPU_TESTS_ON_TPU"):
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not os.environ.get("PT_TPU_TESTS_ON_TPU"):
    # the axon TPU plugin can pin the platform before conftest's env vars
    # are read (pytest plugins import jax first); the config API wins
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the BDPT/PPM scan programs take minutes to
# compile on this 1-core CPU; cache them across test runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_pt_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
