"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4:
the JAX analog of a fake backend).

Agreement tests run at MATCHED sample counts: the sharded and single-device
renderers estimate the same integral, so their image means must agree to a
few percent of Monte-Carlo noise (round-1 verdict: 50% tolerances made the
tests vacuous)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from path_tracing_tpu.config import RenderConfig
from path_tracing_tpu.parallel.shard import (make_mesh, render_bdpt_sharded,
                                             render_ppm_sharded,
                                             render_pt_sharded)
from path_tracing_tpu.scene.camera import make_camera
from path_tracing_tpu.scene.parser import load_scene

W = H = 16


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    p = load_scene("/root/reference/input.txt")
    scene = p.to_device()
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=2, light_depth=2,
                       delta_budget=2)
    return scene, cam, cfg, make_mesh(8)


def test_pt_sharded_runs_and_matches_statistics(setup):
    scene, cam, cfg, mesh = setup
    spp = 128
    img = np.asarray(render_pt_sharded(scene, cam, W, H, spp, cfg,
                                       jax.random.PRNGKey(0), mesh))
    assert img.shape == (W * H, 3) and np.all(np.isfinite(img))
    # depth-2 PT at tiny spp lights roughly a third of the box
    assert float(np.mean(img.sum(-1) > 1e-4)) > 0.25
    # agreement with the single-device renderer at the SAME spp
    from path_tracing_tpu.integrators.pt import render_pt

    ref = np.asarray(render_pt(scene, cam, W, H, spp, cfg,
                               jax.random.PRNGKey(1)))
    a = np.clip(img, 0, 1).mean()
    b = np.clip(ref, 0, 1).mean()
    assert abs(a - b) / max(b, 1e-6) < 0.05, (a, b)


def test_bdpt_sharded_all_gather(setup):
    scene, cam, cfg, mesh = setup
    spp, spl = 4, 16
    img = np.asarray(render_bdpt_sharded(scene, cam, W, H, spp, spl, cfg,
                                         jax.random.PRNGKey(0), mesh,
                                         chunk=16))
    assert img.shape == (W * H, 3) and np.all(np.isfinite(img))
    assert float(np.mean(img.sum(-1) > 1e-4)) > 0.8
    from path_tracing_tpu.integrators.bdpt import render_bdpt

    ref = np.asarray(render_bdpt(scene, cam, W, H, spp, spl, cfg,
                                 jax.random.PRNGKey(1)))
    a = np.clip(img, 0, 1).mean()
    b = np.clip(ref, 0, 1).mean()
    assert abs(a - b) / max(b, 1e-6) < 0.05, (a, b)


def test_hybrid_mesh_matches_flat(setup):
    """A ("dcn", "dp") 2x4 hybrid mesh must render the SAME image as the
    flat 8-device mesh: per-shard RNG folds use the mesh-linear index and
    all_gather(tiled) concatenates in the same order, so PT/BDPT are exact;
    PPM's flux psum may reduce hierarchically (summation-order jitter)."""
    scene, cam, cfg, mesh = setup
    hybrid = make_mesh(8, dcn=2)
    assert hybrid.axis_names == ("dcn", "dp") and hybrid.devices.shape == (2, 4)

    key = jax.random.PRNGKey(0)
    a = np.asarray(render_pt_sharded(scene, cam, W, H, 16, cfg, key, mesh))
    b = np.asarray(render_pt_sharded(scene, cam, W, H, 16, cfg, key, hybrid))
    np.testing.assert_array_equal(a, b)

    a = np.asarray(render_bdpt_sharded(scene, cam, W, H, 2, 8, cfg, key,
                                       mesh, chunk=16))
    b = np.asarray(render_bdpt_sharded(scene, cam, W, H, 2, 8, cfg, key,
                                       hybrid, chunk=16))
    np.testing.assert_array_equal(a, b)

    a = np.asarray(render_ppm_sharded(scene, cam, W, H, 512, cfg, key, mesh))
    b = np.asarray(render_ppm_sharded(scene, cam, W, H, 512, cfg, key, hybrid))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_sharded_light_assignment_matches_global_sequence(setup):
    """Shards must sample the GLOBAL light-assignment sequence
    (global path index % num_lights), not each restart it locally.

    With 8 shards of 1 path each on the 4-light input.txt, the old
    per-shard ``arange(P_local) % nl`` gave every shard light 0; the
    global form covers all four lights.  Vertex-0 ``emit_dir`` is a
    deterministic function of the assigned light, so the check is exact
    (no RNG involvement)."""
    scene, cam, cfg, mesh = setup
    from path_tracing_tpu.integrators.bdpt import trace_light_paths

    key = jax.random.PRNGKey(7)
    total = 8  # nl=4, so a 1-path shard can't cover the lights locally
    full = trace_light_paths(scene, cfg, total, 2, key)
    shards = [trace_light_paths(scene, cfg, 1, 2,
                                jax.random.fold_in(key, s),
                                start=s, total=total)
              for s in range(8)]
    got = np.concatenate([np.asarray(s.emit_dir[:, 0]) for s in shards])
    np.testing.assert_array_equal(got, np.asarray(full.emit_dir[:, 0]))
    got_c = np.concatenate([np.asarray(s.source_cutoff[:, 0])
                            for s in shards])
    np.testing.assert_array_equal(got_c,
                                  np.asarray(full.source_cutoff[:, 0]))


def test_sharded_padding_lanes_are_dead(setup):
    """Mesh-rounding pad lanes (global index >= total) must store NO
    vertices and emit NO photons — otherwise padding silently inflates
    the total light flux."""
    scene, cam, cfg, mesh = setup
    from path_tracing_tpu.integrators.bdpt import trace_light_paths
    from path_tracing_tpu.integrators.ppm import ppm_photon_trace

    key = jax.random.PRNGKey(3)
    lv = trace_light_paths(scene, cfg, 4, 2, key, start=6, total=8)
    valid = np.asarray(lv.valid)
    assert valid[:2, 0].all()          # rows 6,7 are real
    assert not valid[2:].any()         # rows 8,9 are pad: nothing stored

    ev = ppm_photon_trace(scene, cfg, 4, 2, key, start=6, total=8)
    # pad lanes (3rd/4th of the 4) start dead -> no valid deposit events
    # (events flatten iter-major: (iters, P) -> (E,))
    valid = np.asarray(ev.valid).reshape(-1, 4)
    assert valid[:, :2].any(), "real lanes should deposit on input.txt"
    assert not valid[:, 2:].any()


MULTILIGHT_SCENE = """
E 0 6 14
V 0 0 0  0 1 0
F 50
R 16 16
// white diffuse floor
M 0.8 0.8 0.8 1.0 0.0 0.0
T -20 0 -20  20 0 -20  20 0 20
T -20 0 -20  20 0 20  -20 0 20
// red and green spot lights above, pointing down
L -3 8 0  0 -1 0  40 2 2  60 0 0.5
L  3 8 0  0 -1 0  2 40 2  60 0 0.5
"""


def test_multilight_sharded_is_unbiased():
    """2-light scene at 1 photon/path per shard: the old per-shard
    assignment traced ONLY the red light on every shard (green channel
    identically zero) and let the mesh-rounding pad double the BDPT path
    count.  Both integrators must keep every light's share."""
    from path_tracing_tpu.integrators.bdpt import render_bdpt
    from path_tracing_tpu.scene.parser import parse_scene_text

    p = parse_scene_text(MULTILIGHT_SCENE)
    assert p.lights is not None and len(p.lights) == 2
    scene = p.to_device()
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=2, light_depth=2,
                       delta_budget=2)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(0)

    # BDPT: spl=2, ls=1 -> 4 true paths pad to 8 (1/shard)
    img = np.asarray(render_bdpt_sharded(scene, cam, W, H, 4, 2, cfg, key,
                                         mesh, light_sample=1, chunk=16))
    assert np.all(np.isfinite(img))
    red, green = float(img[:, 0].sum()), float(img[:, 1].sum())
    assert red > 0.0 and green > 0.0, (red, green)
    ref = np.asarray(render_bdpt(scene, cam, W, H, 4, 2, cfg,
                                 jax.random.PRNGKey(1), light_sample=1))
    # pad lanes dead: total energy matches single-device (not ~2x)
    a, b = np.clip(img, 0, 1).mean(), np.clip(ref, 0, 1).mean()
    assert abs(a - b) / max(b, 1e-6) < 0.25, (a, b)

    # PPM: spl=4 -> 8 photons (1/shard); old code emitted 8 red, 0 green.
    # A fat gather radius makes every deposited photon visible to some
    # hitpoint, so "green exists" is deterministic, not a lottery.
    cfg_fat = RenderConfig(width=W, height=H, eye_depth=2, light_depth=2,
                           delta_budget=2, ppm_radius=2.5)
    img = np.asarray(render_ppm_sharded(scene, cam, W, H, 4, cfg_fat, key,
                                        mesh))
    assert np.all(np.isfinite(img))
    assert float(img[:, 0].sum()) > 0.0, "red lost in sharded PPM"
    assert float(img[:, 1].sum()) > 0.0, "green light lost in sharded PPM"


def test_ppm_sharded_psum(setup):
    scene, cam, cfg, mesh = setup
    spl = 4096
    img = np.asarray(render_ppm_sharded(scene, cam, W, H, spl, cfg,
                                        jax.random.PRNGKey(0), mesh))
    assert img.shape == (W * H, 3) and np.all(np.isfinite(img))
    assert float(img.sum()) > 0.0
    # matched-count agreement: the sharded path traces the same number of
    # photons (rounded up to the mesh) as the single-device renderer
    from path_tracing_tpu.integrators.ppm import render_ppm

    ref = np.asarray(render_ppm(scene, cam, W, H, spl, cfg,
                                jax.random.PRNGKey(1)))
    a = np.clip(img, 0, 1).mean()
    b = np.clip(ref, 0, 1).mean()
    assert abs(a - b) / max(b, 1e-6) < 0.05, (a, b)
