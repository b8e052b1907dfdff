"""Emission/direction sampling distribution tests (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from path_tracing_tpu.ops.sampling import (cosine_hemisphere_dir,
                                           sample_light_emission,
                                           uniform_sphere_dir)


def test_uniform_sphere_dir_moments():
    @jax.jit
    def f():
        n = 200_000
        u = 1.0 - jax.random.uniform(jax.random.PRNGKey(0), (2, n))
        d = uniform_sphere_dir(u[0], u[1])
        return jnp.mean(d, axis=0), jnp.mean(d * d, axis=0), \
            jnp.mean(jnp.sum(d * d, -1))

    mean, second, norm = f()
    np.testing.assert_allclose(np.asarray(mean), 0.0, atol=0.01)
    np.testing.assert_allclose(np.asarray(second), 1 / 3, atol=0.01)
    np.testing.assert_allclose(float(norm), 1.0, atol=1e-5)


def test_cosine_hemisphere_moments():
    @jax.jit
    def f():
        n = 200_000
        u = 1.0 - jax.random.uniform(jax.random.PRNGKey(1), (2, n))
        nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        d = cosine_hemisphere_dir(nrm, u[0], u[1])
        return jnp.mean(d[:, 2]), jnp.min(d[:, 2])

    mean_z, min_z = f()
    # E[cos theta] under pdf cos/pi = 2/3
    np.testing.assert_allclose(float(mean_z), 2 / 3, atol=0.01)
    assert float(min_z) >= 0.0


def test_spot_cone_emission_within_cutoff():
    @jax.jit
    def f():
        n = 50_000
        u = 1.0 - jax.random.uniform(jax.random.PRNGKey(2), (2, n))
        pos = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
        ldir = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (n, 1))
        cutoff = jnp.full((n,), jnp.deg2rad(30.0))
        par = jnp.zeros((n,), jnp.int32)
        r = jnp.full((n,), 0.1)
        e = sample_light_emission(pos, ldir, cutoff, par, r,
                                  jnp.array([-1.0, -1, -1]),
                                  jnp.array([1.0, 1, 1]), u[0], u[1])
        cos_to_axis = jnp.sum(e.direction * ldir, -1)
        on_ball = jnp.linalg.norm(e.origin - pos, axis=-1)
        return jnp.min(cos_to_axis), on_ball

    min_cos, on_ball = f()
    # all emission directions inside the 30-degree cone (bdpt_cu.cu:78)
    assert float(min_cos) >= np.cos(np.deg2rad(30.0)) - 1e-4
    np.testing.assert_allclose(np.asarray(on_ball), 0.1, atol=1e-5)


def test_parallel_emission_plane_behind_scene():
    @jax.jit
    def f():
        n = 10_000
        u = 1.0 - jax.random.uniform(jax.random.PRNGKey(3), (2, n))
        pos = jnp.zeros((n, 3))
        ldir = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (n, 1))
        cutoff = jnp.full((n,), jnp.pi)
        par = jnp.ones((n,), jnp.int32)
        r = jnp.full((n,), 0.1)
        smin = jnp.array([-1.0, -1.0, -1.0])
        smax = jnp.array([1.0, 1.0, 1.0])
        e = sample_light_emission(pos, ldir, cutoff, par, r, smin, smax,
                                  u[0], u[1])
        return e

    e = f()
    d = np.asarray(e.direction)
    np.testing.assert_allclose(d, [[0, -1, 0]] * d.shape[0], atol=1e-6)
    o = np.asarray(e.origin)
    # origins on a plane 2*scene_radius above the center along -dir
    scene_radius = np.sqrt(12.0) / 2
    np.testing.assert_allclose(o[:, 1], 2 * scene_radius, atol=1e-4)
    # jittered across the full plane extent
    assert o[:, 0].std() > 0.3 * scene_radius
