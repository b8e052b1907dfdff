"""Headline benchmark: Mpaths/sec/chip, 1080p unidirectional PT.

BASELINE.md north star: >= 100 Mpaths/sec/chip at 1080p PT on a v5p chip
(vs_baseline = value / 100).  Paths = camera paths = W*H*spp per frame.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpaths/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time


def main() -> int:
    import jax

    from path_tracing_tpu.runtime import setup_jax_cache
    setup_jax_cache()

    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.parser import load_scene

    scene_path = "/root/reference/mis_test.txt"  # BASELINE config 2 scene
    W, H = 1920, 1080
    spp = 4
    p = load_scene(scene_path)
    scene = p.to_device()
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=4, delta_budget=4)
    key = jax.random.PRNGKey(0)

    # compile + warm up.  NOTE: block_until_ready does not actually block
    # through this environment's tunneled TPU; a scalar host read is the
    # only honest sync, so every timed frame ends with float(img.sum()).
    img = render_pt(scene, cam, W, H, spp, cfg, key)
    float(img.sum())

    # timed runs
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        img = render_pt(scene, cam, W, H, spp, cfg,
                        jax.random.fold_in(key, i + 1))
        float(img.sum())
    dt = (time.perf_counter() - t0) / iters

    paths = W * H * spp
    mpaths = paths / dt / 1e6
    print(json.dumps({
        "metric": "1080p unidirectional PT (NEE+MIS), mis_test.txt, "
                  f"spp={spp}, eye_depth=4",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s",
        "vs_baseline": round(mpaths / 100.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
