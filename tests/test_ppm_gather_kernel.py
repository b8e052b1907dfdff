"""Pallas PPM gather kernel (ops/pallas_ppm_gather) equivalence tests.

Run in interpret mode so they execute on the CPU CI backend.  The oracle is
an all-pairs ball query: with collision-free lexicographic cell keys and
cell >= radius, the 27-neighborhood join is exactly "every valid event
within the search radius passing the normal gate" (ppm_cu.cu:225-263 minus
the reference hash's rare in-neighborhood collision double-counts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from path_tracing_tpu.config import RenderConfig
from path_tracing_tpu.integrators.ppm import HitPoints, PhotonEvents
from path_tracing_tpu.ops.bsdf import bsdf_evaluate
from path_tracing_tpu.ops.pallas_ppm_gather import gather_flux_pallas
from path_tracing_tpu.scene.parser import load_scene
from path_tracing_tpu.scene.types import Material

INPUT_TXT = "/root/reference/input.txt"


@pytest.fixture(scope="module")
def scene():
    return load_scene(INPUT_TXT).to_device()


def _random_problem(rs, scene, B, E, sigma=0.03):
    lo = np.asarray(scene.scene_min)
    span = np.asarray(scene.scene_max) - lo
    hp_pos = (lo + rs.rand(B, 3) * span).astype(np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    # half aligned-up normals (dense matches), half random
    hp_n = np.where(rs.rand(B, 1) < 0.5, up,
                    rs.randn(B, 3)).astype(np.float32)
    hp_n /= np.linalg.norm(hp_n, axis=-1, keepdims=True)
    hp_wo = rs.randn(B, 3).astype(np.float32)
    hp_wo /= np.linalg.norm(hp_wo, axis=-1, keepdims=True)
    ev_pos = (hp_pos[rs.randint(0, B, E)]
              + rs.randn(E, 3).astype(np.float32) * sigma)
    ev_n = np.where(rs.rand(E, 1) < 0.7, up,
                    rs.randn(E, 3)).astype(np.float32)
    ev_n /= np.linalg.norm(ev_n, axis=-1, keepdims=True)
    ev_wi = rs.randn(E, 3).astype(np.float32)
    ev_wi /= np.linalg.norm(ev_wi, axis=-1, keepdims=True)

    hp = HitPoints(
        pos=jnp.asarray(hp_pos), normal=jnp.asarray(hp_n),
        wo=jnp.asarray(hp_wo),
        mtl=Material(base_color=jnp.asarray(rs.rand(B, 3).astype(np.float32)),
                     roughness=jnp.asarray(rs.rand(B).astype(np.float32)),
                     metallic=jnp.asarray(
                         ((rs.rand(B) > 0.7) * rs.rand(B)).astype(np.float32)),
                     eta=jnp.zeros((B,))),
        throughput=jnp.asarray(rs.rand(B, 3).astype(np.float32)),
        valid=jnp.asarray(rs.rand(B) > 0.1))
    ev = PhotonEvents(
        pos=jnp.asarray(ev_pos), normal=jnp.asarray(ev_n),
        wi=jnp.asarray(ev_wi),
        flux=jnp.asarray(rs.rand(E, 3).astype(np.float32)),
        valid=jnp.asarray(rs.rand(E) > 0.2))
    return hp, ev


def _oracle(cfg, hp, ev, r2_scale=1.0):
    B = hp.pos.shape[0]
    E = ev.pos.shape[0]
    r2 = cfg.ppm_radius ** 2 * r2_scale
    hp_pos, hp_n = np.asarray(hp.pos), np.asarray(hp.normal)
    ev_pos, ev_n = np.asarray(ev.pos), np.asarray(ev.normal)
    flux = np.zeros((B, 3), np.float32)
    count = np.zeros(B, np.int64)
    brdf_fn = jax.jit(bsdf_evaluate)
    for b in range(B):
        if not bool(hp.valid[b]):
            continue
        m1 = jax.tree.map(lambda x: x[b:b + 1], hp.mtl)
        for e in range(E):
            if not bool(ev.valid[e]):
                continue
            if float(np.dot(hp_n[b], ev_n[e])) <= 0.01:
                continue
            if float(np.sum((hp_pos[b] - ev_pos[e]) ** 2)) >= r2:
                continue
            brdf = np.asarray(brdf_fn(m1, hp.wo[b:b + 1], ev.wi[e:e + 1],
                                      hp.normal[b:b + 1]))[0]
            if not np.all(np.isfinite(brdf)) or np.any(brdf < 0):
                continue
            flux[b] += np.asarray(ev.flux[e]) * brdf \
                * np.asarray(hp.throughput[b])
            count[b] += 1
    return flux, count


def test_gather_kernel_matches_allpairs(scene):
    cfg = RenderConfig(width=16, height=16)
    rs = np.random.RandomState(7)
    hp, ev = _random_problem(rs, scene, B=48, E=400)
    flux, count, overflow = gather_flux_pallas(
        scene, cfg, hp, ev, max_cells=128, interpret=True)
    assert int(overflow) == 0
    exp_flux, exp_count = _oracle(cfg, hp, ev)
    assert int(exp_count.sum()) > 50  # the fixture actually exercises pairs
    np.testing.assert_array_equal(np.asarray(count), exp_count)
    np.testing.assert_allclose(np.asarray(flux), exp_flux,
                               rtol=2e-3, atol=1e-5)


def test_gather_kernel_shrunk_radius(scene):
    cfg = RenderConfig(width=16, height=16)
    rs = np.random.RandomState(11)
    hp, ev = _random_problem(rs, scene, B=32, E=200)
    flux, count, overflow = gather_flux_pallas(
        scene, cfg, hp, ev, r2_scale=0.4, max_cells=128, interpret=True)
    assert int(overflow) == 0
    exp_flux, exp_count = _oracle(cfg, hp, ev, r2_scale=0.4)
    np.testing.assert_array_equal(np.asarray(count), exp_count)
    np.testing.assert_allclose(np.asarray(flux), exp_flux,
                               rtol=2e-3, atol=1e-5)


def test_gather_kernel_event_cap(scene):
    """The sorted-event cap compacts invalid rows for free; when it bites
    into valid events the drop is reported via overflow and the output
    stays finite."""
    cfg = RenderConfig(width=16, height=16)
    rs = np.random.RandomState(5)
    hp, ev = _random_problem(rs, scene, B=32, E=4096)
    ev = PhotonEvents(pos=ev.pos, normal=ev.normal, wi=ev.wi, flux=ev.flux,
                      valid=jnp.ones((4096,), bool))
    # cap = ceil(4096*0.25/1024)*1024 = 1024 < 4096 valid -> 3072 dropped
    cfg_cap = cfg.with_(ppm_event_cap_frac=0.25)
    flux, count, ovf = gather_flux_pallas(scene, cfg_cap, hp, ev,
                                          max_cells=128, interpret=True)
    assert int(ovf) == 4096 - 1024
    assert np.all(np.isfinite(np.asarray(flux)))
    # a generous cap covers everything and matches the uncapped gather
    f2, c2, ovf2 = gather_flux_pallas(scene, cfg.with_(ppm_event_cap_frac=1.0),
                                      hp, ev, max_cells=128, interpret=True)
    assert int(ovf2) == 0
    exp_flux, exp_count = _oracle(cfg, hp, ev)
    np.testing.assert_array_equal(np.asarray(c2), exp_count)
    np.testing.assert_allclose(np.asarray(f2), exp_flux, rtol=2e-3,
                               atol=1e-4)


def test_gather_kernel_cell_cap_overflow(scene):
    """Hitpoints beyond the max_cells cap are dropped and counted."""
    cfg = RenderConfig(width=16, height=16)
    rs = np.random.RandomState(3)
    hp, ev = _random_problem(rs, scene, B=64, E=100, sigma=0.2)
    _, _, ovf_all = gather_flux_pallas(scene, cfg, hp, ev,
                                       max_cells=256, interpret=True)
    flux, count, ovf = gather_flux_pallas(scene, cfg, hp, ev,
                                          max_cells=4, interpret=True)
    assert int(ovf_all) == 0
    assert int(ovf) > 0
    # covered hitpoints still match the oracle; dropped ones are zero
    exp_flux, exp_count = _oracle(cfg, hp, ev)
    got_c = np.asarray(count)
    covered = got_c > 0
    np.testing.assert_allclose(np.asarray(flux)[covered],
                               exp_flux[covered], rtol=2e-3, atol=1e-5)


def test_gather_kernel_degenerate_event_does_not_poison(scene):
    """An event with a degenerate wi (zero vector -> NaN half-vector/BRDF)
    must be excluded WITHOUT poisoning the row sums of valid neighbors
    (0 * NaN = NaN if the product runs before the mask)."""
    cfg = RenderConfig(width=16, height=16)
    lo = np.asarray(scene.scene_min)
    hp_pos = (lo + 0.5 * (np.asarray(scene.scene_max) - lo))[None, :]
    up = np.array([[0.0, 1.0, 0.0]], np.float32)
    hp = HitPoints(
        pos=jnp.asarray(hp_pos, jnp.float32), normal=jnp.asarray(up),
        wo=jnp.asarray(up),
        mtl=Material(base_color=jnp.full((1, 3), 0.5),
                     roughness=jnp.full((1,), 0.8),
                     metallic=jnp.zeros((1,)), eta=jnp.zeros((1,))),
        throughput=jnp.ones((1, 3)), valid=jnp.ones((1,), bool))
    # event 0: healthy; event 1: wi = 0 (NaN BRDF); both inside the radius
    ev_pos = np.repeat(hp_pos, 2, axis=0) + np.array(
        [[0.01, 0, 0], [-0.01, 0, 0]], np.float32)
    ev = PhotonEvents(
        pos=jnp.asarray(ev_pos, jnp.float32),
        normal=jnp.asarray(np.repeat(up, 2, axis=0)),
        wi=jnp.asarray([[0.6, 0.8, 0.0], [0.0, 0.0, 0.0]]),
        flux=jnp.ones((2, 3)), valid=jnp.ones((2,), bool))
    flux, count, ovf = gather_flux_pallas(scene, cfg, hp, ev,
                                          max_cells=32, interpret=True)
    flux = np.asarray(flux)
    # the invariant: NO NaN escapes (the kernel zeroes invalid-BRDF pairs
    # BEFORE the row-sum product) and the healthy deposit survives.  The
    # degenerate pair itself may count as a 0-ish finite deposit (eval_local
    # and bsdf_evaluate only diverge in this unreachable corner).
    assert np.all(np.isfinite(flux)), flux
    assert int(np.asarray(count)[0]) >= 1
    assert float(flux[0].sum()) > 0.0
