"""Hardware-free Pallas kernel equivalence tests (interpret mode).

``PT_TPU_INTERPRET=1`` runs every non-PRNG Pallas kernel in interpret mode,
which executes on the CPU backend — so the kernel bodies (nearest-hit,
blockers, the HBM-streaming sweeps, the fused shade/connect kernels and
the PPM gather) are correctness-tested on every CI run, not only when a
TPU is attached (round-1 VERDICT: the TPU-gated tests were structurally
blind whenever the chip was wedged).  The two persistent megakernels run
here too: under the knob they substitute a deterministic counter-hash draw
for the on-core PRNG (``pltpu.prng_seed`` has no CPU lowering), so their
equivalence checks are statistical (different stream) but reproducible;
their bit-exact on-core tests stay in tests/test_pallas.py.

Tolerances: the Pallas nearest-hit resolves ~0.05% of knife-edge hits
differently from the XLA sweep (documented tie-break divergence, same
bound as the TPU-side test), so whole-render comparisons allow a small
fraction of outlier pixels; kernels compared on MATCHED inputs must agree
essentially everywhere.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from path_tracing_tpu.config import RenderConfig
from path_tracing_tpu.scene.camera import make_camera
from path_tracing_tpu.scene.obj_loader import load_any_scene
from path_tracing_tpu.scene.parser import load_scene

W = H = 16


@pytest.fixture()
def interp_env():
    """Toggle helper: returns a context-switcher between the XLA reference
    path and the interpret-mode Pallas path.  jit caches key on the traced
    program, and the env knobs are trace-time — clear between toggles."""
    saved = {k: os.environ.get(k)
             for k in ("PT_TPU_INTERPRET", "PT_TPU_NO_PALLAS")}

    def set_mode(mode: str):
        os.environ.pop("PT_TPU_INTERPRET", None)
        os.environ.pop("PT_TPU_NO_PALLAS", None)
        if mode == "xla":
            os.environ["PT_TPU_NO_PALLAS"] = "1"
        elif mode == "interpret":
            os.environ["PT_TPU_INTERPRET"] = "1"
        else:
            raise ValueError(mode)
        jax.clear_caches()

    yield set_mode
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    jax.clear_caches()


@pytest.fixture(scope="module")
def cornell():
    p = load_scene("/root/reference/input.txt")
    scene = p.to_device()
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=3, light_depth=3,
                       delta_budget=3)
    return scene, cam, cfg


def test_nearest_hit_interpret_matches_xla(cornell, interp_env):
    from path_tracing_tpu.ops import intersect as I

    scene, _, _ = cornell
    k = jax.random.PRNGKey(0)
    B = 1024
    ro = jax.random.uniform(k, (B, 3), minval=-0.45, maxval=0.45)
    rd = jax.random.normal(jax.random.fold_in(k, 1), (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    interp_env("xla")
    h1 = jax.tree.map(np.asarray, I.find_closest_hit(scene, ro, rd))
    interp_env("interpret")
    h2 = jax.tree.map(np.asarray, I.find_closest_hit(scene, ro, rd))

    same_t = np.isclose(h1.t, h2.t, rtol=1e-5, atol=1e-6) | \
        ((h1.t >= 1e19) & (h2.t >= 1e19))
    assert same_t.mean() > 0.9995
    assert (h1.hit == h2.hit).all()
    assert (h1.is_light == h2.is_light).all()
    m = h2.hit & same_t
    assert np.isclose(h1.normal, h2.normal, atol=1e-4)[m].mean() > 0.999
    assert np.isclose(h1.mtl.base_color, h2.mtl.base_color, atol=1e-6)[m].all()


def test_blocker_interpret_matches_xla(cornell, interp_env):
    from path_tracing_tpu.ops import intersect as I

    scene, _, _ = cornell
    k = jax.random.PRNGKey(1)
    B = 2048
    p1 = jax.random.uniform(k, (B, 3), minval=-0.49, maxval=0.49)
    p2 = jax.random.uniform(jax.random.fold_in(k, 1), (B, 3),
                            minval=-0.49, maxval=0.49)
    for rule in (True, False):
        interp_env("xla")
        a = np.asarray(I.transmittance(scene, p1, p2,
                                       dielectrics_block=rule))
        interp_env("interpret")
        b = np.asarray(I.transmittance(scene, p1, p2,
                                       dielectrics_block=rule))
        # binary verdicts on matched rays: exact agreement
        np.testing.assert_array_equal(a, b)


def test_stream_kernels_interpret_match_vmem(interp_env):
    """The HBM-streaming sweep against the VMEM kernel on the same
    rays/mesh (force_stream pins streaming for a VMEM-sized mesh)."""
    from path_tracing_tpu.ops.pallas_intersect import nearest_hit_pallas

    p = load_any_scene("tests/fixtures/sphere.obj")
    scene = p.to_device()
    B = 256
    k = jax.random.PRNGKey(0)
    ro = jnp.zeros((B, 3)) + jnp.array(p.eye)
    rd = jax.random.normal(k, (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)

    interp_env("interpret")
    ref = nearest_hit_pallas(scene, ro, rd)
    got = nearest_hit_pallas(scene, ro, rd, force_stream=True)

    a, b = np.asarray(ref["t"]), np.asarray(got["t"])
    same_t = np.isclose(a, b, rtol=1e-5) | ((a >= 1e19) & (b >= 1e19))
    assert same_t.mean() > 0.999, same_t.mean()
    assert (np.asarray(ref["flag"]) == np.asarray(got["flag"])).all()
    for f in ("nx", "ny", "nz", "bcr", "bcg", "bcb", "eta"):
        assert np.isclose(np.asarray(ref[f]), np.asarray(got[f]),
                          atol=1e-4)[same_t].mean() > 0.999, f


def test_super_traversal_interpret_matches_xla(interp_env):
    """2-level traversal (octant-ordered supers + front-to-back children)
    on a mesh ABOVE the 64-cluster threshold — sphere.obj is too small to
    descend supers, so this is the only hardware-free coverage of the
    super walk, in both kernels (VMEM + the stream sweep)."""
    from path_tracing_tpu.ops import intersect as I
    from path_tracing_tpu.ops.pallas_intersect import nearest_hit_pallas
    from path_tracing_tpu.scene.synth import icosphere_scene

    p = icosphere_scene(17000)
    scene = p.to_device()
    assert scene.num_triangles >= 64 * 256  # supers active
    B = 256
    k = jax.random.PRNGKey(0)
    ro = jnp.zeros((B, 3)) + jnp.array(p.eye)
    ctr = (scene.scene_min + scene.scene_max) / 2
    ext = float(jnp.max(scene.scene_max - scene.scene_min))
    tgt = ctr + jax.random.normal(k, (B, 3)) * 0.35 * ext
    rd = tgt - ro
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)

    interp_env("xla")
    h_x = jax.tree.map(np.asarray, I.find_closest_hit(scene, ro, rd))
    interp_env("interpret")
    h_v = jax.tree.map(np.asarray, I.find_closest_hit(scene, ro, rd))
    h_s = nearest_hit_pallas(scene, ro, rd, force_stream=True)

    assert np.asarray(h_x.hit).mean() > 0.5  # rays actually hit the mesh
    same = np.isclose(h_x.t, h_v.t, rtol=1e-5) | \
        ((h_x.t >= 1e19) & (h_v.t >= 1e19))
    assert same.mean() > 0.999
    ts = np.asarray(h_s["t"])
    sv = np.isclose(h_v.t, ts, rtol=1e-5) | \
        ((h_v.t >= 1e19) & (ts >= 1e19))
    assert sv.mean() > 0.999
    m = h_x.hit & same
    assert np.isclose(h_x.normal, h_v.normal, atol=1e-4)[m].mean() > 0.999


def test_pt_fused_pipeline_interpret_matches_xla(cornell, interp_env):
    """Whole PT sample (nearest kernel + fused shade + NEE shadow sweep) on
    the identical RNG stream: the fused kernel is fed the same uniforms, so
    agreement is near-bit outside nearest-hit tie-break pixels."""
    from path_tracing_tpu.integrators.pt import trace_paths

    scene, cam, cfg = cornell
    idx = jnp.arange(W * H, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    interp_env("xla")
    a = np.asarray(trace_paths(scene, cam, cfg, idx % W, idx // W, key))
    interp_env("interpret")
    b = np.asarray(trace_paths(scene, cam, cfg, idx % W, idx // W, key))

    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 1e-3
    close = np.isclose(a, b, rtol=1e-4, atol=1e-5).all(axis=1)
    assert close.mean() > 0.99, close.mean()


def test_bdpt_connect_kernel_matches_xla_on_matched_inputs(cornell,
                                                           interp_env):
    """connect_pallas vs the chunked XLA _connect with IDENTICAL eye
    vertices and light-vertex table — isolates the kernel semantics from
    the (documented) nearest-hit walk divergence.  Must agree everywhere."""
    from path_tracing_tpu.integrators.bdpt import (PDF_FWD_FLOOR, _connect,
                                                   compact_flat,
                                                   primary_ray_dirs,
                                                   trace_light_paths)
    from path_tracing_tpu.ops import rng
    from path_tracing_tpu.ops.intersect import find_closest_hit
    from path_tracing_tpu.ops.math3 import normalize

    scene, cam, cfg = cornell
    key = jax.random.PRNGKey(0)
    B = W * H

    interp_env("xla")
    lv = trace_light_paths(scene, cfg, 64, 4, jax.random.fold_in(key, 1))
    lv_flat, n_valid = compact_flat(lv.flat())
    idx = jnp.arange(B, dtype=jnp.int32)
    jx, jy = rng.uniforms(jax.random.fold_in(key, 0xA11CE), (B,), 2)
    rd0 = primary_ray_dirs(cam, idx % W, idx // W, jx, jy)
    ro = jnp.broadcast_to(cam.eye, (B, 3))
    hit = find_closest_hit(scene, ro, rd0)
    act = hit.hit & ~hit.is_light
    wo_e = -rd0
    wo_s = normalize(cam.eye[None] - hit.pos)
    g_mis = jnp.abs(jax.random.normal(jax.random.fold_in(key, 5), (B,)))
    eye_f = jnp.where(hit.mtl.eta > 0.0, 0.0,
                      (1.0 / PDF_FWD_FLOOR) * (1.0 + g_mis))
    tp = jnp.ones((B, 3))

    a = np.asarray(_connect(scene, cfg, lv_flat, n_valid, hit.pos,
                            hit.normal, tp, hit.mtl, wo_e, wo_s, eye_f, 64))

    interp_env("interpret")
    from path_tracing_tpu.ops.pallas_connect import (connect_pallas,
                                                     pack_light_vertices)

    lv_tab = pack_light_vertices(lv_flat)
    b = np.asarray(connect_pallas(
        scene, lv_tab, n_valid, hit.pos, hit.normal, tp, hit.mtl, wo_e,
        wo_s, eye_f, act, clamp_val=cfg.clamp,
        dielectrics_block=cfg.shadow_dielectrics_block))

    m = np.asarray(act)
    rel = np.abs(a - b)[m] / (np.abs(a[m]) + 1e-3)
    assert (rel.max(axis=1) < 1e-3).all(), rel.max()


def test_bdpt_render_interpret_statistical(cornell, interp_env,
                                           monkeypatch):
    from path_tracing_tpu.integrators.bdpt import render_bdpt

    # pin the scan + per-bounce-connect pipeline: it shares the XLA path's
    # Threefry streams, so agreement is per-pixel.  The eye megakernel
    # (counter-hash stream) has its own statistical test below.
    monkeypatch.setenv("PT_TPU_NO_BDPT_MEGAKERNEL", "1")
    scene, cam, cfg = cornell
    key = jax.random.PRNGKey(0)
    interp_env("xla")
    a = np.asarray(render_bdpt(scene, cam, W, H, 1, 4, cfg, key))
    interp_env("interpret")
    b = np.asarray(render_bdpt(scene, cam, W, H, 1, 4, cfg, key))

    # the eye walk may diverge on tie-break hits (amplified by the 1e8 MIS
    # prefactors) — bound the outlier fraction, not the max
    rel = np.abs(a - b) / (np.abs(a) + 1e-3)
    assert (rel.max(axis=1) < 1e-3).mean() > 0.97
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 0.05


def test_megakernels_interpret_statistical_and_deterministic(cornell,
                                                             interp_env):
    """The persistent PT wavefront and BDPT eye megakernels under interpret
    mode (counter-hash PRNG replaces the on-core generator): a DIFFERENT
    sample stream than both the XLA path and real hardware, so agreement is
    statistical — but the estimator must match in expectation, stay finite,
    and be bit-deterministic per seed.  The bounce math itself
    (_shade_core / connect_core) is bit-pinned by the per-bounce kernel
    tests; this covers the regeneration/accumulation loop."""
    from path_tracing_tpu.integrators.bdpt import render_bdpt
    from path_tracing_tpu.integrators.pt import render_pt

    scene, cam, cfg = cornell
    key = jax.random.PRNGKey(0)
    spp = 32

    interp_env("xla")
    a_pt = np.asarray(render_pt(scene, cam, W, H, spp, cfg, key))
    a_bd = np.asarray(render_bdpt(scene, cam, W, H, 4, 4, cfg, key))

    interp_env("interpret")
    b_pt = np.asarray(render_pt(scene, cam, W, H, spp, cfg, key))
    b_bd = np.asarray(render_bdpt(scene, cam, W, H, 4, 4, cfg, key))

    assert np.isfinite(b_pt).all() and np.isfinite(b_bd).all()
    ca, cb = np.clip(a_pt, 0, 1).mean(), np.clip(b_pt, 0, 1).mean()
    assert abs(ca - cb) / max(ca, 1e-6) < 0.15, (ca, cb)
    da, db = np.clip(a_bd, 0, 1).mean(), np.clip(b_bd, 0, 1).mean()
    assert abs(da - db) / max(da, 1e-6) < 0.15, (da, db)

    b_pt2 = np.asarray(render_pt(scene, cam, W, H, spp, cfg, key))
    np.testing.assert_array_equal(b_pt, b_pt2)


def test_bdpt_eye_tiled_table_identity(cornell, interp_env):
    """Tile-local RIS plumbing: a (T, Vp, 40) table whose every tile holds
    the SAME rows as the shared (Vp, 40) table must render bit-identically
    (the only difference is the per-tile BlockSpec + the rank-3 accessor
    in connect_core — the math may not change)."""
    from path_tracing_tpu.integrators.bdpt import (compact_flat,
                                                   trace_light_paths)
    from path_tracing_tpu.ops.pallas_bdpt_eye import (bdpt_eye_pallas,
                                                      eye_tiling)
    from path_tracing_tpu.ops.pallas_connect import pack_light_vertices

    scene, cam, cfg = cornell
    interp_env("interpret")
    key = jax.random.PRNGKey(5)
    lv = trace_light_paths(scene, cfg, scene.num_lights * 4, 4, key)
    lv_flat, n_valid = compact_flat(lv.flat())
    lv_tab = pack_light_vertices(lv_flat)                  # (Vp, 40)

    B = W * H
    idx = jnp.arange(B, dtype=jnp.int32)
    px, py = idx % W, idx // W
    T, _ = eye_tiling(B)
    tiled = jnp.broadcast_to(lv_tab[None], (T,) + lv_tab.shape)

    a = bdpt_eye_pallas(scene, lv_tab, n_valid, cam, px, py, 2, cfg,
                        jnp.int32(7), 1.0)
    b = bdpt_eye_pallas(scene, tiled, n_valid, cam, px, py, 2, cfg,
                        jnp.int32(7), 1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ppm_render_interpret_statistical(cornell, interp_env,
                                          monkeypatch):
    """The Pallas gather uses collision-free lexicographic cell keys while
    the XLA hash grid reproduces the reference's in-neighborhood collision
    double-counts — small per-pixel diffs are semantic, not bugs.  The
    photon MEGAKERNEL is pinned off here (its on-core stream differs from
    Threefry, round 4) so both sides trace identical photons and the
    comparison isolates the gather."""
    from path_tracing_tpu.integrators.ppm import render_ppm

    monkeypatch.setenv("PT_TPU_NO_PHOTON_MEGA", "1")
    scene, cam, cfg = cornell
    key = jax.random.PRNGKey(0)
    interp_env("xla")
    a = np.asarray(render_ppm(scene, cam, W, H, 256, cfg, key))
    interp_env("interpret")
    b = np.asarray(render_ppm(scene, cam, W, H, 256, cfg, key))

    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 5e-3
    np.testing.assert_allclose(a, b, atol=0.05)


def test_photon_megakernel_statistical(cornell, interp_env):
    """Photon-trace megakernel vs the XLA scan: different RNG streams
    (on-core / counter-hash vs Threefry), same estimator — valid-event
    count and total deposited flux agree statistically, and the kernel is
    deterministic per seed."""
    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.ppm import ppm_photon_trace

    scene, _cam, _cfg = cornell
    cfg = RenderConfig(width=W, height=H, eye_depth=2, light_depth=3,
                       delta_budget=2)
    key = jax.random.PRNGKey(1)
    interp_env("interpret")
    ev = ppm_photon_trace(scene, cfg, 4096, 4096, key)
    v = np.asarray(ev.valid)
    f = np.asarray(ev.flux)
    ev_rep = ppm_photon_trace(scene, cfg, 4096, 4096, key)
    np.testing.assert_array_equal(v, np.asarray(ev_rep.valid))
    np.testing.assert_array_equal(f, np.asarray(ev_rep.flux))

    os.environ["PT_TPU_NO_PHOTON_MEGA"] = "1"
    try:
        jax.clear_caches()
        ev2 = ppm_photon_trace(scene, cfg, 4096, 4096, key)
    finally:
        os.environ.pop("PT_TPU_NO_PHOTON_MEGA", None)
        jax.clear_caches()
    v2 = np.asarray(ev2.valid)
    f2 = np.asarray(ev2.flux)
    assert np.isfinite(f[v]).all()
    # counts and totals within 5% (independent streams at 4096 photons)
    assert abs(v.sum() - v2.sum()) / max(v2.sum(), 1) < 0.05
    tot, tot2 = float(f[v].sum()), float(f2[v2].sum())
    assert abs(tot - tot2) / max(tot2, 1e-6) < 0.05


def test_sharded_renderers_ride_pallas_tiers(cornell, interp_env,
                                             monkeypatch):
    """Multi-chip x Pallas: the sharded renderers dispatch the SAME fast
    tiers as single-chip (PT/BDPT persistent megakernels, the PPM
    cell-blocked gather) inside ``shard_map`` — proven by running all three
    on the 8-device virtual mesh with every kernel in interpret mode, with
    trace-time spies pinning that the Pallas tier (not an XLA fallback) was
    the one dispatched.  PT additionally checks statistical agreement with
    the single-device interpret render (different per-shard counter-hash
    streams, so mean-level only); BDPT/PPM keep minimal shapes — their
    sharded-vs-single agreement is pinned at 5% by test_sharding.py on the
    XLA path, which shares all math with the kernels via the per-bounce
    equivalence tests above."""
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.ops import (pallas_bdpt_eye, pallas_ppm_gather,
                                      pallas_shade)
    from path_tracing_tpu.parallel.shard import (make_mesh,
                                                 render_bdpt_sharded,
                                                 render_ppm_sharded,
                                                 render_pt_sharded)

    scene, cam, cfg = cornell
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(0)
    interp_env("interpret")

    called = set()

    def spy(module, name, tag):
        orig = getattr(module, name)

        def wrapper(*a, **kw):
            called.add(tag)
            return orig(*a, **kw)

        monkeypatch.setattr(module, name, wrapper)

    spy(pallas_shade, "render_wavefront_pallas", "pt_megakernel")
    spy(pallas_bdpt_eye, "bdpt_eye_pallas", "bdpt_eye_megakernel")
    spy(pallas_ppm_gather, "gather_flux_pallas", "ppm_gather")

    spp = 8
    s_pt = np.asarray(render_pt_sharded(scene, cam, W, H, spp, cfg, key,
                                        mesh))
    r_pt = np.asarray(render_pt(scene, cam, W, H, spp, cfg,
                                jax.random.PRNGKey(1)))
    assert "pt_megakernel" in called
    assert np.isfinite(s_pt).all() and s_pt.max() > 0
    a, b = np.clip(s_pt, 0, 1).mean(), np.clip(r_pt, 0, 1).mean()
    assert abs(a - b) / max(b, 1e-6) < 0.15, (a, b)

    s_bd = np.asarray(render_bdpt_sharded(scene, cam, W, H, 1, 4, cfg, key,
                                          mesh, chunk=16))
    assert "bdpt_eye_megakernel" in called
    assert np.isfinite(s_bd).all() and s_bd.max() > 0

    s_pp = np.asarray(render_ppm_sharded(scene, cam, W, H, 64, cfg, key,
                                         mesh))
    assert "ppm_gather" in called
    assert np.isfinite(s_pp).all() and s_pp.max() > 0
