"""Intersection + visibility unit tests (analytic cases, SURVEY.md §4)."""
import jax.numpy as jnp
import numpy as np

import jax

from path_tracing_tpu.ops.intersect import (INF, find_closest_hit, sphere_ts,
                                            transmittance, triangle_ts)

# eager dispatch is slow in this environment; jit the entry points
find_closest_hit = jax.jit(find_closest_hit)
transmittance = jax.jit(transmittance, static_argnames="dielectrics_block")
sphere_ts = jax.jit(sphere_ts)
triangle_ts = jax.jit(triangle_ts)
from path_tracing_tpu.scene.types import Material, scene_from_numpy


def _mat(n, eta=0.0):
    return Material(base_color=jnp.ones((n, 3)) * 0.5,
                    roughness=jnp.ones((n,)),
                    metallic=jnp.zeros((n,)),
                    eta=jnp.full((n,), eta))


def _scene(sph_c=(), sph_r=(), tris=(), lights=(), sph_eta=0.0, tri_eta=0.0):
    tris = np.asarray(tris, np.float32).reshape(-1, 3, 3)
    lights = np.asarray(lights, np.float32).reshape(-1, 12)
    return scene_from_numpy(
        sph_center=np.asarray(sph_c, np.float32).reshape(-1, 3),
        sph_radius=np.asarray(sph_r, np.float32),
        sph_mtl=_mat(len(sph_r), sph_eta),
        tri_v0=tris[:, 0], tri_v1=tris[:, 1], tri_v2=tris[:, 2],
        tri_mtl=_mat(len(tris), tri_eta),
        light_pos=lights[:, 0:3], light_dir=lights[:, 3:6],
        light_illum=lights[:, 6:9], light_cutoff=lights[:, 9],
        light_is_parallel=lights[:, 10].astype(np.int32),
        light_ball_r=lights[:, 11],
    )


def test_sphere_ts_near_far_and_window():
    ro = jnp.array([[0.0, 0.0, -3.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    c = jnp.array([[0.0, 0.0, 0.0]])
    r = jnp.array([1.0])
    t = sphere_ts(ro, rd, c, r, INF)
    np.testing.assert_allclose(np.asarray(t), [[2.0]], atol=1e-5)
    # origin inside the sphere -> far root
    t = sphere_ts(jnp.array([[0.0, 0.0, 0.0]]), rd, c, r, INF)
    np.testing.assert_allclose(np.asarray(t), [[1.0]], atol=1e-5)
    # beyond max_dist -> miss (INF sentinel; compare in float32)
    t = sphere_ts(ro, rd, c, r, 1.5)
    assert float(t[0, 0]) >= 1e19


def test_triangle_ts_moller_trumbore():
    ro = jnp.array([[0.25, 0.25, -1.0], [2.0, 2.0, -1.0]])
    rd = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    t = triangle_ts(ro, rd, v0, v1, v2, INF)
    np.testing.assert_allclose(np.asarray(t[0]), [1.0], atol=1e-5)
    assert float(t[1, 0]) >= 1e19  # outside barycentric range


def test_closest_hit_picks_nearest_and_flips_normal():
    sc = _scene(sph_c=[[0, 0, 2], [0, 0, 5]], sph_r=[1.0, 1.0])
    h = find_closest_hit(sc, jnp.array([[0.0, 0.0, 0.0]]),
                         jnp.array([[0.0, 0.0, 1.0]]))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 1.0, atol=1e-5)
    # normal faces the ray origin
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-5)
    assert not bool(h.is_light[0])


def test_light_ball_hit_material():
    sc = _scene(sph_c=[[0, 0, 10]], sph_r=[1.0],
                lights=[[0, 0, 2, 0, -1, 0, 3.0, 2.0, 1.0, np.pi, 0, 0.5]])
    h = find_closest_hit(sc, jnp.array([[0.0, 0.0, 0.0]]),
                         jnp.array([[0.0, 0.0, 1.0]]))
    assert bool(h.is_light[0])
    np.testing.assert_allclose(float(h.t[0]), 1.5, atol=1e-5)
    # CPU-oracle light material semantics (cpu_bdpt.cpp:69-72)
    np.testing.assert_allclose(np.asarray(h.mtl.base_color[0]), [3, 2, 1])
    assert float(h.mtl.eta[0]) == 0.0 and float(h.mtl.roughness[0]) == 1.0


def test_miss():
    sc = _scene(sph_c=[[0, 0, 2]], sph_r=[0.5])
    h = find_closest_hit(sc, jnp.array([[0.0, 5.0, 0.0]]),
                         jnp.array([[0.0, 0.0, 1.0]]))
    assert not bool(h.hit[0])


def test_transmittance_opaque_blocks():
    sc = _scene(tris=[[[-1, -1, 1], [1, -1, 1], [0, 1, 1]]])
    p1 = jnp.array([[0.0, 0.0, 0.0]])
    p2 = jnp.array([[0.0, 0.0, 2.0]])
    t = transmittance(sc, p1, p2, dielectrics_block=True)
    np.testing.assert_allclose(np.asarray(t), [0.0])
    # unobstructed path
    t = transmittance(sc, p1, jnp.array([[0.0, 0.0, -2.0]]),
                      dielectrics_block=True)
    np.testing.assert_allclose(np.asarray(t), [1.0])


def test_transmittance_dielectric_modes():
    """GPU shadows block on glass; the CPU oracle passes it (quirk 12)."""
    sc = _scene(sph_c=[[0, 0, 1]], sph_r=[0.3], sph_eta=1.5)
    p1 = jnp.array([[0.0, 0.0, 0.0]])
    p2 = jnp.array([[0.0, 0.0, 2.0]])
    assert float(transmittance(sc, p1, p2, dielectrics_block=True)[0]) == 0.0
    assert float(transmittance(sc, p1, p2, dielectrics_block=False)[0]) == 1.0


def test_transmittance_ignores_light_balls():
    sc = _scene(sph_c=[[5, 5, 5]], sph_r=[0.1],
                lights=[[0, 0, 1, 0, -1, 0, 1, 1, 1, np.pi, 0, 0.3]])
    t = transmittance(sc, jnp.array([[0.0, 0.0, 0.0]]),
                      jnp.array([[0.0, 0.0, 2.0]]), dielectrics_block=True)
    np.testing.assert_allclose(np.asarray(t), [1.0])


def test_endpoint_epsilon_window():
    """Occluders within 1e-3 of either endpoint don't block (check_visibility
    min_d/max_d, geometric.cuh:299-301)."""
    sc = _scene(tris=[[[-1, -1, 1.9995], [1, -1, 1.9995], [0, 1, 1.9995]]])
    t = transmittance(sc, jnp.array([[0.0, 0.0, 0.0]]),
                      jnp.array([[0.0, 0.0, 2.0]]), dielectrics_block=True)
    np.testing.assert_allclose(np.asarray(t), [1.0])
