"""Pallas-vs-XLA equivalence tests (run on TPU only; CI forces CPU where the
Pallas path is inert).  On TPU: PT_TPU_GOLDEN=1 python -m pytest tests/test_pallas.py
with JAX_PLATFORM_NAME unset."""
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pallas kernels only run on TPU; CI uses the CPU backend")


def _setup():
    import jax.numpy as jnp

    from path_tracing_tpu.scene.parser import load_scene

    p = load_scene("/root/reference/input.txt")
    scene = p.to_device()
    k = jax.random.PRNGKey(0)
    B = 8192
    ro = jax.random.uniform(k, (B, 3), minval=-0.45, maxval=0.45)
    rd = jax.random.normal(jax.random.fold_in(k, 1), (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return scene, ro, rd


def test_nearest_hit_equivalence():
    from path_tracing_tpu.ops import intersect as I

    scene, ro, rd = _setup()
    # NB: jit traces cache per function object; clear between env toggles or
    # the second call silently reuses the first backend's trace (vacuous A/B)
    os.environ["PT_TPU_NO_PALLAS"] = "1"
    jax.clear_caches()
    h1 = jax.tree.map(np.asarray, jax.jit(I.find_closest_hit)(scene, ro, rd))
    del os.environ["PT_TPU_NO_PALLAS"]
    jax.clear_caches()
    h2 = jax.tree.map(np.asarray, jax.jit(I.find_closest_hit)(scene, ro, rd))

    same_t = np.isclose(h1.t, h2.t, rtol=1e-5, atol=1e-6) | \
        ((h1.t >= 1e19) & (h2.t >= 1e19))
    assert same_t.mean() > 0.9995
    assert (h1.hit == h2.hit).all()
    assert (h1.is_light == h2.is_light).all()
    m = h2.hit & same_t
    assert np.isclose(h1.normal, h2.normal, atol=1e-4)[m].mean() > 0.999
    assert np.isclose(h1.mtl.base_color, h2.mtl.base_color, atol=1e-6)[m].all()
    assert np.isclose(h1.mtl.eta, h2.mtl.eta)[m].all()


def test_transmittance_equivalence_and_dielectric_rules():
    import jax.numpy as jnp

    from path_tracing_tpu.ops import intersect as I

    scene, ro, rd = _setup()
    p2 = ro + rd * 2.0
    tr = {}
    for pallas in (False, True):
        if not pallas:
            os.environ["PT_TPU_NO_PALLAS"] = "1"
        else:
            os.environ.pop("PT_TPU_NO_PALLAS", None)
        jax.clear_caches()
        for rule in (True, False):
            tr[(pallas, rule)] = np.asarray(jax.jit(
                I.transmittance, static_argnames="dielectrics_block")(
                    scene, ro, p2, dielectrics_block=rule))
    assert (tr[(True, True)] == tr[(False, True)]).all()
    assert (tr[(True, False)] == tr[(False, False)]).all()

    # a segment crossing only the glass sphere discriminates the rules
    p1 = jnp.tile(jnp.array([[0.2, -0.3, 0.0]]), (256, 1))
    p2 = jnp.tile(jnp.array([[0.2, 0.3, 0.0]]), (256, 1))
    blocked = float(jax.jit(I.transmittance,
                            static_argnames="dielectrics_block")(
        scene, p1, p2, dielectrics_block=True)[0])
    passes = float(jax.jit(I.transmittance,
                           static_argnames="dielectrics_block")(
        scene, p1, p2, dielectrics_block=False)[0])
    assert blocked == 0.0 and passes == 1.0


def test_megakernel_statistical_equivalence_and_determinism():
    """The persistent wavefront megakernel draws from the on-core PRNG (a
    different sample stream than the XLA/per-bounce Threefry path), so
    equivalence is statistical: same estimator, converged means must agree.
    Also checks bit-reproducibility per seed."""
    import jax.numpy as jnp

    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.parser import load_scene

    assert not os.environ.get("PT_TPU_NO_MEGAKERNEL"), "unset for this test"
    p = load_scene("/root/reference/input.txt")
    scene = p.to_device()
    W = H = 64
    spp = 64
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=4, delta_budget=4)
    key = jax.random.PRNGKey(7)

    a = np.asarray(render_pt(scene, cam, W, H, spp, cfg, key))
    b = np.asarray(render_pt(scene, cam, W, H, spp, cfg, key))
    assert np.array_equal(a, b), "megakernel render not deterministic"
    assert not np.isnan(a).any()

    os.environ["PT_TPU_NO_MEGAKERNEL"] = "1"
    try:
        render_pt.clear_cache()  # backend choice is baked in at trace time
        ref = np.asarray(render_pt(scene, cam, W, H, spp, cfg,
                                   jax.random.fold_in(key, 1)))
    finally:
        del os.environ["PT_TPU_NO_MEGAKERNEL"]
        render_pt.clear_cache()
    # per-channel image means within ~2% at spp 64 (MC noise floor)
    ma, mr = a.mean(axis=0), ref.mean(axis=0)
    assert np.all(np.abs(ma - mr) / np.maximum(np.abs(mr), 1e-6) < 0.02), (
        ma, mr)


def test_bdpt_megakernel_statistical_equivalence_and_determinism():
    """BDPT eye megakernel (on-core PRNG stream) vs the scan + per-bounce
    connection kernel pipeline: same estimator, converged means agree."""
    import jax.numpy as jnp

    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.bdpt import render_bdpt
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.parser import load_scene

    assert not os.environ.get("PT_TPU_NO_BDPT_MEGAKERNEL")
    p = load_scene("/root/reference/input.txt")
    scene = p.to_device()
    W = H = 64
    spp, spl = 16, 8
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=4, light_depth=4,
                       delta_budget=4)
    key = jax.random.PRNGKey(11)

    a = np.asarray(render_bdpt(scene, cam, W, H, spp, spl, cfg, key))
    b = np.asarray(render_bdpt(scene, cam, W, H, spp, spl, cfg, key))
    assert np.array_equal(a, b), "BDPT megakernel render not deterministic"
    assert not np.isnan(a).any()

    os.environ["PT_TPU_NO_BDPT_MEGAKERNEL"] = "1"
    try:
        render_bdpt.clear_cache()
        # SAME key: identical light subpaths (the dominant variance source
        # at 256 paths); only the eye sample stream differs
        ref = np.asarray(render_bdpt(scene, cam, W, H, spp, spl, cfg, key))
    finally:
        del os.environ["PT_TPU_NO_BDPT_MEGAKERNEL"]
        render_bdpt.clear_cache()
    ma, mr = a.mean(axis=0), ref.mean(axis=0)
    assert np.all(np.abs(ma - mr) / np.maximum(np.abs(mr), 1e-6) < 0.05), (
        ma, mr)


def test_nearest_hit_with_uv_textures(tmp_path):
    """Pallas nearest-hit with in-kernel UV interpolation matches the XLA
    textured path (same base_color modulation)."""
    import jax.numpy as jnp

    from conftest import make_textured_quad_obj
    from path_tracing_tpu.ops import intersect as I
    from path_tracing_tpu.scene.obj_loader import load_obj

    p = load_obj(make_textured_quad_obj(tmp_path))
    scene = p.to_device()
    assert scene.has_textures

    k = jax.random.PRNGKey(2)
    B = 1024
    xy = jax.random.uniform(k, (B, 2), minval=-0.2, maxval=1.2)
    ro = jnp.concatenate([xy, jnp.full((B, 1), -1.0)], axis=1)
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))

    h_pl = jax.tree.map(np.asarray, jax.jit(I.find_closest_hit)(scene, ro, rd))
    os.environ["PT_TPU_NO_PALLAS"] = "1"
    jax.clear_caches()
    try:
        h_xla = jax.tree.map(np.asarray,
                             jax.jit(I.find_closest_hit)(scene, ro, rd))
    finally:
        del os.environ["PT_TPU_NO_PALLAS"]
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(h_pl.hit), np.asarray(h_xla.hit))
    m = np.asarray(h_pl.hit)
    np.testing.assert_allclose(np.asarray(h_pl.mtl.base_color)[m],
                               np.asarray(h_xla.mtl.base_color)[m],
                               rtol=1e-4, atol=1e-5)


def test_textured_fused_shade_matches_xla_path(tmp_path):
    """The textured fused tier (with_uv nearest kernel -> XLA texel gather
    -> shade_step_tex_pallas) statistically matches the pure-XLA wavefront
    on a textured scene (same estimator, same Threefry stream)."""
    import jax.numpy as jnp

    from conftest import make_textured_quad_obj
    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.obj_loader import load_any_scene

    # load_any_scene: default framing + overhead spot light (a bare
    # load_obj scene has no lights and no camera -> degenerate render)
    p = load_any_scene(make_textured_quad_obj(tmp_path))
    scene = p.to_device()
    assert scene.has_textures
    W = H = 64
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=3, delta_budget=3)
    key = jax.random.PRNGKey(5)

    os.environ["PT_TPU_NO_FUSED_SHADE"] = "1"
    jax.clear_caches()
    try:
        ref = np.asarray(render_pt(scene, cam, W, H, 32, cfg, key))
    finally:
        del os.environ["PT_TPU_NO_FUSED_SHADE"]
        jax.clear_caches()
    a = np.asarray(render_pt(scene, cam, W, H, 32, cfg, key))
    assert np.all(np.isfinite(a))
    ma, mr = a.mean(axis=0), ref.mean(axis=0)
    # same RNG stream, same estimator — tight agreement expected
    assert np.all(np.abs(ma - mr) / np.maximum(np.abs(mr), 1e-6) < 0.02), (
        ma, mr)


def test_streaming_kernels_match_vmem_on_tpu():
    """HBM-streaming nearest-hit (force_stream) agrees with the VMEM-table
    kernel on real hardware (the CPU suite only covers interpret mode).

    The VPU sweep shares ``_mt_core``'s arithmetic and should agree
    exactly, but is held to float tolerance here.  (The determinant-form
    MXU backend this test also covered was deleted in round 3: slower in
    both precision forms AND the chip-faulting knob — see the history note
    in ops/pallas_intersect.py.)"""
    import jax.numpy as jnp

    from path_tracing_tpu.ops.pallas_intersect import nearest_hit_pallas
    from path_tracing_tpu.scene.obj_loader import load_any_scene

    p = load_any_scene("tests/fixtures/sphere.obj")
    scene = p.to_device()
    k = jax.random.PRNGKey(9)
    B = 4096
    ro = jax.random.uniform(k, (B, 3), minval=-0.8, maxval=0.8)
    rd = jax.random.normal(jax.random.fold_in(k, 1), (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    # distinct lambdas -> distinct jit caches (see clear_caches note above)
    h_v = jax.tree.map(np.asarray, jax.jit(
        lambda a, b: nearest_hit_pallas(scene, a, b))(ro, rd))
    h_s = jax.tree.map(np.asarray, jax.jit(
        lambda a, b: nearest_hit_pallas(scene, a, b, force_stream=True))(
            ro, rd))
    flag_agree = h_v["flag"] == h_s["flag"]
    assert flag_agree.mean() > 0.999
    both = flag_agree & (h_v["flag"] > 0)
    assert both.sum() > 500
    np.testing.assert_allclose(h_s["t"][both], h_v["t"][both],
                               rtol=1e-3, atol=1e-5)
    for name in ("nx", "ny", "nz", "bcr", "rough", "metal", "eta"):
        np.testing.assert_allclose(h_s[name][both], h_v[name][both],
                                   rtol=1e-3, atol=1e-3, err_msg=name)
