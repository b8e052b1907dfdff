"""Signal-driven in-render control (VERDICT r4 missing item 2: the
reference GUI's ImGui "Save Image" button, main.cpp:386-391, re-imagined
for a headless host as SIGUSR1 snapshot / SIGUSR2 save-and-stop)."""
import os
import signal
import subprocess
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not hasattr(signal, "SIGUSR1"),
                    reason="platform without SIGUSR1")
def test_sigusr1_snapshot_and_sigusr2_stop(tmp_path):
    out = str(tmp_path / "img.png")
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    p = subprocess.Popen(
        [sys.executable, "-u", "-m", "path_tracing_tpu.cli",
         "--input", "/root/reference/input.txt", "--mode", "pt",
         "--spp", "1", "--width", "16", "--height", "16",
         "--eye-depth", "2", "--output", out, "--seed", "1",
         "--iters", "500"],
        cwd=ROOT, env=env, stdout=subprocess.PIPE, text=True)
    try:
        deadline = time.time() + 600
        snapped = False
        for line in p.stdout:
            if time.time() > deadline:
                pytest.fail("timed out waiting for render output")
            if "[Render] iter 2:" in line and not snapped:
                snapped = True
                p.send_signal(signal.SIGUSR1)
            elif "[Signal] SIGUSR1" in line:
                p.send_signal(signal.SIGUSR2)
            elif "[Signal] SIGUSR2" in line:
                break
        rc = p.wait(timeout=300)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()
    assert rc == 0
    # the SIGUSR1 snapshot was written mid-run (some iteration >= 3)
    snaps = [f for f in os.listdir(tmp_path) if ".snap" in f]
    assert snaps, "SIGUSR1 produced no snapshot"
    # SIGUSR2 stopped the 500-iteration run early AND saved the final image
    assert os.path.exists(out)
    from path_tracing_tpu.film import read_png

    assert read_png(out).shape == (16, 16, 3)
    assert read_png(str(tmp_path / snaps[0])).shape == (16, 16, 3)
