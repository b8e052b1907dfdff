"""BSDF eval/pdf/sample consistency tests (SURVEY.md §4).

All heavy computations run under ``jax.jit``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from path_tracing_tpu.ops import math3
from path_tracing_tpu.ops.bsdf import bsdf_evaluate, bsdf_pdf, bsdf_sample
from path_tracing_tpu.scene.types import Material


def mat(color, rough, metal, eta, n=1):
    return Material(
        base_color=jnp.tile(jnp.array([color], jnp.float32), (n, 1)),
        roughness=jnp.full((n,), rough, jnp.float32),
        metallic=jnp.full((n,), metal, jnp.float32),
        eta=jnp.full((n,), eta, jnp.float32),
    )


NORMAL = jnp.array([0.0, 0.0, 1.0])


def test_pdf_is_finite_and_diffuse_part_normalized():
    """The diffuse half of the mixed pdf integrates to 0.5 exactly; the VNDF
    half is built on the reference's typo'd D (see ops/microfacet.py) so the
    total is < 1.  Pin both facts."""

    @jax.jit
    def estimate():
        n = 200_000
        u = jax.random.uniform(jax.random.PRNGKey(0), (2, n))
        z = u[0]
        r = jnp.sqrt(jnp.maximum(0, 1 - z * z))
        phi = 2 * jnp.pi * u[1]
        wi = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
        wo = jnp.tile(math3.normalize(jnp.array([[0.3, 0.0, 0.95]])), (n, 1))
        m = mat([0.5, 0.5, 0.5], rough=0.7, metal=0.0, eta=0.0, n=n)
        nrm = jnp.tile(NORMAL[None], (n, 1))
        pdf = bsdf_pdf(m, wo, wi, nrm)
        return jnp.mean(pdf) * 2 * jnp.pi  # uniform hemisphere pdf = 1/2pi

    est = float(estimate())
    # 0.5 (cosine) + 0.5 * (typo'd-VNDF mass < 1).  Empirically ~0.775.
    assert 0.55 < est < 1.0, est


def test_sample_pdf_agrees_with_pdf_fn():
    @jax.jit
    def f():
        n = 8192
        u = jax.random.uniform(jax.random.PRNGKey(1), (3, n))
        wo = jnp.tile(math3.normalize(jnp.array([[0.2, 0.1, 0.97]])), (n, 1))
        m = mat([0.8, 0.6, 0.4], rough=0.4, metal=0.0, eta=0.0, n=n)
        nrm = jnp.tile(NORMAL[None], (n, 1))
        s = bsdf_sample(m, wo, nrm, u[0], u[1], u[2], jnp.ones(n))
        pdf2 = bsdf_pdf(m, wo, s.wi, nrm)
        val2 = bsdf_evaluate(m, wo, s.wi, nrm)
        return s, pdf2, val2

    s, pdf2, val2 = f()
    assert not bool(jnp.any(s.is_delta))
    alive = np.asarray(s.pdf > 1e-6)
    np.testing.assert_allclose(np.asarray(s.pdf)[alive],
                               np.asarray(pdf2)[alive], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.value)[alive],
                               np.asarray(val2)[alive], rtol=1e-3, atol=1e-5)


def test_smooth_dielectric_delta_energy():
    """Delta reflect/refract: weight*|cos|/pdf == 1 for white glass, and the
    medium eta tracks entry/exit (geometric.cuh:500-528)."""

    @jax.jit
    def f():
        n = 4096
        u = jax.random.uniform(jax.random.PRNGKey(2), (3, n))
        wo = jnp.tile(math3.normalize(jnp.array([[0.3, 0.2, 0.93]])), (n, 1))
        m = mat([1.0, 1.0, 1.0], rough=0.0, metal=0.0, eta=1.5, n=n)
        nrm = jnp.tile(NORMAL[None], (n, 1))
        s = bsdf_sample(m, wo, nrm, u[0], u[1], u[2], jnp.ones(n))
        w = s.value * (jnp.abs(math3.dot(s.wi, nrm))
                       / jnp.maximum(s.pdf, 1e-9))[:, None]
        return s, w, math3.dot(s.wi, nrm)

    s, w, cos_wi = f()
    assert bool(jnp.all(s.is_delta))
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-4)
    refracted = np.asarray(cos_wi) < 0
    new_eta = np.asarray(s.new_eta)
    assert np.all(new_eta[refracted] == 1.5)
    assert np.all(new_eta[~refracted] == 1.0)


def test_smooth_conductor_mirror():
    @jax.jit
    def f():
        n = 16
        u = jax.random.uniform(jax.random.PRNGKey(3), (3, n))
        wo = jnp.tile(math3.normalize(jnp.array([[0.5, -0.1, 0.86]])), (n, 1))
        m = mat([0.9, 0.8, 0.7], rough=0.0, metal=1.0, eta=0.0, n=n)
        nrm = jnp.tile(NORMAL[None], (n, 1))
        s = bsdf_sample(m, wo, nrm, u[0], u[1], u[2], jnp.ones(n))
        return s, math3.reflect(-wo, nrm)

    s, expected = f()
    assert bool(jnp.all(s.is_delta))
    np.testing.assert_allclose(np.asarray(s.wi), np.asarray(expected), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.pdf), 1.0, atol=1e-6)


def test_eval_zero_for_smooth_dielectric_and_opposite_sides():
    @jax.jit
    def f():
        wo = math3.normalize(jnp.array([[0.3, 0.2, 0.93]]))
        wi = math3.normalize(jnp.array([[0.1, 0.0, 0.99]]))
        nrm = NORMAL[None]
        m = mat([1.0, 1.0, 1.0], rough=0.0, metal=0.0, eta=1.5)
        e1 = bsdf_evaluate(m, wo, wi, nrm)
        p1 = bsdf_pdf(m, wo, wi, nrm)
        m2 = mat([0.5, 0.5, 0.5], rough=0.5, metal=0.0, eta=0.0)
        wi_below = math3.normalize(jnp.array([[0.1, 0.0, -0.99]]))
        e2 = bsdf_evaluate(m2, wo, wi_below, nrm)
        return e1, p1, e2

    e1, p1, e2 = f()
    assert float(jnp.max(e1)) == 0.0
    assert float(p1[0]) == 0.0
    np.testing.assert_allclose(np.asarray(e2), 0.0, atol=1e-7)


def test_rough_estimator_furnace_bounded():
    """MC hemispherical reflectance stays in a sane band for gray rough
    diffuse (the reference's eta=0 Fresnel quirk adds an F~1 specular lobe
    so the bound is loose, not 0.5 exactly)."""

    @jax.jit
    def f():
        n = 200_000
        # (0,1] draws for curand parity (see ops/rng.uniforms)
        u = 1.0 - jax.random.uniform(jax.random.PRNGKey(4), (3, n))
        wo = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        m = mat([0.5, 0.5, 0.5], rough=0.8, metal=0.0, eta=0.0, n=n)
        nrm = jnp.tile(NORMAL[None], (n, 1))
        s = bsdf_sample(m, wo, nrm, u[0], u[1], u[2], jnp.ones(n))
        contrib = s.value * (jnp.abs(math3.dot(s.wi, nrm))
                             / jnp.maximum(s.pdf, 1e-9))[:, None]
        # drop invalid lanes exactly like the integrators (is_valid_color)
        ok = (s.pdf > 1e-6) & math3.is_valid_color(contrib)
        contrib = jnp.where(ok[:, None], contrib, 0.0)
        return jnp.mean(contrib, axis=0)

    est = np.asarray(f())
    assert np.all(est > 0.3) and np.all(est < 1.3), est
