"""Quantitative PPM parity vs an independent NumPy oracle.

The PPM pipeline had only A/B (Pallas-vs-XLA) and cross-integrator
statistical checks — the same structure that was blind to the round-1 PT
NEE bug.  This test renders a small diffuse box with the framework's
``render_ppm`` and with ``tests/ppm_numpy_oracle.py`` — a literal NumPy
transcription of ``/root/reference/src/ppm_cu.cu`` — and pins the image
mean and per-pixel agreement.  A missing factor anywhere in the photon
flux chain (illum*Nl/spl emission, bsdf*throughput deposit, pi*r^2
resolve) shifts the mean far outside the tolerance.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from path_tracing_tpu.config import RenderConfig
from path_tracing_tpu.scene.camera import make_camera
from path_tracing_tpu.scene.types import Material, scene_from_numpy

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ppm_numpy_oracle import render_ppm_numpy  # noqa: E402

W = H = 16
RADIUS = 0.3


def _quad(tris, p0, p1, p2, p3):
    tris.append((p0, p1, p2))
    tris.append((p0, p2, p3))


def _box_scene():
    """Diffuse box with one wide-cone (180 deg) sphere light at the
    ceiling: photons spread over the whole box, every wall collects."""
    import jax.numpy as jnp

    tris = []
    s = 2.0
    _quad(tris, (-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s))
    _quad(tris, (-s, 4, -s), (s, 4, -s), (s, 4, s), (-s, 4, s))
    _quad(tris, (-s, 0, -s), (s, 0, -s), (s, 4, -s), (-s, 4, -s))
    _quad(tris, (-s, 0, -s), (-s, 0, s), (-s, 4, s), (-s, 4, -s))
    _quad(tris, (s, 0, -s), (s, 0, s), (s, 4, s), (s, 4, -s))
    tri = np.array(tris, np.float32)
    albedo = np.array([[0.75, 0.75, 0.75]] * 4
                      + [[0.7, 0.2, 0.2]] * 2 + [[0.2, 0.7, 0.2]] * 2
                      + [[0.2, 0.2, 0.7]] * 2, np.float32)
    nt = tri.shape[0]
    sph_c = np.array([[0.6, 0.8, -0.4]], np.float32)
    sph_r = np.array([0.8], np.float32)
    sph_alb = np.array([[0.7, 0.7, 0.7]], np.float32)

    light_pos = np.array([[0.0, 3.2, 0.0]], np.float32)
    light_dir = np.array([[0.0, -1.0, 0.0]], np.float32)
    light_r = np.array([0.3], np.float32)
    light_illum = np.array([[30.0, 30.0, 27.0]], np.float32)
    cutoff = np.array([np.pi], np.float32)   # 180 deg cone

    def mk_mtl(base):
        n = base.shape[0]
        return Material(base_color=jnp.asarray(base),
                        roughness=jnp.ones((n,), jnp.float32),
                        metallic=jnp.zeros((n,), jnp.float32),
                        eta=jnp.zeros((n,), jnp.float32))

    scene = scene_from_numpy(
        sph_c, sph_r, mk_mtl(sph_alb),
        tri[:, 0], tri[:, 1], tri[:, 2], mk_mtl(albedo),
        light_pos, light_dir, light_illum,
        cutoff, np.array([0], np.int32), light_r)

    np_scene = dict(
        sph_c=sph_c.astype(np.float64), sph_r=sph_r.astype(np.float64),
        sph_m=np.concatenate([sph_alb, np.tile([1.0, 0.0, 0.0], (1, 1))],
                             axis=1),
        tri_v0=np.asarray(scene.tri_v0, np.float64),
        tri_v1=np.asarray(scene.tri_v1, np.float64),
        tri_v2=np.asarray(scene.tri_v2, np.float64),
        tri_m=np.concatenate([np.asarray(scene.tri_mtl.base_color),
                              np.tile([1.0, 0.0, 0.0], (nt, 1))], axis=1),
        light_pos=light_pos.astype(np.float64),
        light_dir=light_dir.astype(np.float64),
        light_r=light_r.astype(np.float64),
        light_illum=light_illum.astype(np.float64),
        light_cutoff=cutoff.astype(np.float64),
    )
    eye = np.array([0.0, 2.0, 5.5], np.float32)
    look = np.array([0.0, 1.8, 0.0], np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    cam = make_camera(eye, look, up, 50.0, W, H)
    np_cam = dict(eye=np.asarray(cam.eye, np.float64),
                  ul=np.asarray(cam.ul, np.float64),
                  dx=np.asarray(cam.dx, np.float64),
                  dy=np.asarray(cam.dy, np.float64))
    return scene, cam, np_scene, np_cam


@pytest.mark.parametrize("spl", [4096])
def test_ppm_matches_numpy_oracle(spl):
    import jax

    from path_tracing_tpu.integrators.ppm import render_ppm

    scene, cam, np_scene, np_cam = _box_scene()
    cfg = RenderConfig(width=W, height=H, eye_depth=4, light_depth=4,
                       delta_budget=0, ppm_radius=RADIUS)

    passes = 4
    img = np.zeros((W * H, 3))
    ref = np.zeros((W * H, 3))
    for i in range(passes):
        img += np.asarray(render_ppm(scene, cam, W, H, spl, cfg,
                                     jax.random.PRNGKey(7 + i)))
        ref += render_ppm_numpy(np_scene, np_cam, W, H, spl, RADIUS,
                                eye_depth=4, light_depth=4, seed=11 + i)
    img /= passes
    ref /= passes

    assert np.isfinite(img).all() and np.isfinite(ref).all()
    # the raw per-pass PPM mean is heavy-tailed (a handful of grazing-angle
    # F=1 specular deposits near the clamp dominate any one pass), so the
    # primary pin is the CLIPPED display-domain mean — measured per-seed
    # spread is ~2%, while a missing flux factor (Nl, 1/spl, pi r^2,
    # throughput) moves it tens of percent
    c_img = float(np.clip(img, 0, 1).mean())
    c_ref = float(np.clip(ref, 0, 1).mean())
    assert c_ref > 0.05  # photons actually land
    rel = abs(c_img - c_ref) / c_ref
    assert rel < 0.05, (c_img, c_ref, rel)
    # gross-factor guard in the raw domain (x2 flux would blow this)
    m_img, m_ref = float(img.mean()), float(ref.mean())
    assert abs(m_img - m_ref) / m_ref < 0.35, (m_img, m_ref)
    # per-pixel display-domain agreement: several sigma of photon noise,
    # far below any structural estimator error
    rmse = float(np.sqrt(np.mean(
        (np.clip(img, 0, 1) - np.clip(ref, 0, 1)) ** 2)))
    assert rmse < 0.25 * c_ref, (rmse, c_ref)
