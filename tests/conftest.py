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


def make_textured_quad_obj(dirpath, n=8):
    """Shared fixture: unit quad in z=0 with uv = xy and a 4-quadrant
    map_Kd checker (UL red / UR green / LL blue / LR white in IMAGE space;
    uv v=1 maps to the top rows).  Returns the .obj path."""
    import os

    import numpy as np

    from path_tracing_tpu.film import write_png

    d = str(dirpath)
    img = np.zeros((n, n, 3), np.uint8)
    img[: n // 2, : n // 2] = (255, 0, 0)
    img[: n // 2, n // 2:] = (0, 255, 0)
    img[n // 2:, : n // 2] = (0, 0, 255)
    img[n // 2:, n // 2:] = (255, 255, 255)
    write_png(os.path.join(d, "check.png"), img)
    with open(os.path.join(d, "quad.mtl"), "w") as f:
        f.write("newmtl tex\nKd 1 1 1\nNs 2\nmap_Kd check.png\n")
    with open(os.path.join(d, "quad.obj"), "w") as f:
        f.write("mtllib quad.mtl\nusemtl tex\n"
                "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
                "f 1/1 2/2 3/3 4/4\n")
    return os.path.join(d, "quad.obj")
