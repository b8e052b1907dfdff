"""Randomized scene fuzzing: every integrator must stay finite and
non-negative on arbitrary (valid) scenes.

The reference can only be driven by hand-written scene files; these
deterministic random scenes sweep material space (diffuse / rough metal /
smooth dielectric / uber), sphere+triangle mixes, and both light kinds
(spot cones incl. the cutoff-360 quirk domain, and parallel lights) to pin
the NaN/negativity invariants the sanitizers (`is_valid_color`,
`clamp_radiance`) are supposed to guarantee on every path.
"""
import jax
import numpy as np
import pytest

from path_tracing_tpu.config import RenderConfig
from path_tracing_tpu.scene.camera import make_camera
from path_tracing_tpu.scene.types import Material, scene_from_numpy

W = H = 8


def _random_scene(seed: int):
    r = np.random.default_rng(seed)
    ns = int(r.integers(1, 5))
    nt = int(r.integers(1, 7))

    def mtl(n):
        kind = r.integers(0, 4, size=n)
        rough = np.where(kind == 0, r.uniform(0.2, 1.0, n),
                         np.where(kind == 1, r.uniform(0.05, 0.5, n),
                                  np.where(kind == 2, 0.0,
                                           r.uniform(0.0, 1.0, n))))
        metal = np.where(kind == 1, 1.0, 0.0)
        eta = np.where(kind == 2, r.uniform(1.1, 2.4, n), 0.0)
        return Material(
            base_color=np.asarray(r.uniform(0.05, 1.0, (n, 3)), np.float32),
            roughness=np.asarray(rough, np.float32),
            metallic=np.asarray(metal, np.float32),
            eta=np.asarray(eta, np.float32))

    tri_v = r.uniform(-3, 3, (nt, 3, 3)).astype(np.float32)
    is_par = int(r.integers(0, 2))
    cutoff = float(r.uniform(0.1, 2 * np.pi))  # radians; >pi = quirk domain
    ldir = r.uniform(-1, 1, 3)
    ldir = ldir / max(np.linalg.norm(ldir), 1e-6)
    scene = scene_from_numpy(
        sph_center=r.uniform(-3, 3, (ns, 3)).astype(np.float32),
        sph_radius=r.uniform(0.2, 1.2, ns).astype(np.float32),
        sph_mtl=mtl(ns),
        tri_v0=tri_v[:, 0], tri_v1=tri_v[:, 1], tri_v2=tri_v[:, 2],
        tri_mtl=mtl(nt),
        light_pos=r.uniform(-2, 2, (1, 3)).astype(np.float32),
        light_dir=np.asarray([ldir], np.float32),
        light_illum=r.uniform(5, 40, (1, 3)).astype(np.float32),
        light_cutoff=np.asarray([cutoff], np.float32),
        light_is_parallel=np.asarray([is_par], np.int32),
        light_ball_r=np.asarray([0.1], np.float32),
    )
    eye = np.asarray([0.0, 0.0, -8.0], np.float32)
    cam = make_camera(eye, np.zeros(3, np.float32),
                      np.asarray([0, 1, 0], np.float32), 50.0, W, H)
    return scene, cam


def _check(img, what):
    a = np.asarray(img)
    assert np.all(np.isfinite(a)), f"{what}: non-finite radiance"
    assert float(a.min()) >= 0.0, f"{what}: negative radiance {a.min()}"


@pytest.mark.parametrize("seed", [11, 23, 37, 59])
def test_fuzz_all_integrators_finite_nonnegative(seed):
    from path_tracing_tpu.integrators.bdpt import render_bdpt
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.integrators.ppm import render_ppm

    scene, cam = _random_scene(seed)
    cfg = RenderConfig(width=W, height=H, eye_depth=3, light_depth=3,
                       delta_budget=3)
    key = jax.random.PRNGKey(seed)
    _check(render_pt(scene, cam, W, H, 4, cfg, key), f"pt seed={seed}")
    _check(render_bdpt(scene, cam, W, H, 2, 4, cfg, key),
           f"bdpt seed={seed}")
    _check(render_ppm(scene, cam, W, H, 512, cfg, key), f"ppm seed={seed}")
