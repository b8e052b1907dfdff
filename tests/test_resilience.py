"""Failure detection / recovery (runtime/resilience.py).

The reference has no failure handling: a CUDA fault mid-render loses the
whole accumulation.  These tests pin the TPU-side replacement — a device
liveness probe and a retrying render supervisor that checkpoints before
retrying and never drops completed iterations.
"""
import jax.numpy as jnp
import pytest

from path_tracing_tpu.runtime.resilience import RenderSupervisor, probe_device


def test_probe_device_healthy():
    assert probe_device(timeout_s=60.0)


def test_probe_device_detects_hang():
    # a probe that cannot finish in time reports unhealthy instead of
    # hanging the caller (the wedged-chip failure mode)
    assert probe_device(timeout_s=0.0) is False


def test_supervisor_retries_transient_fault():
    calls = {"n": 0}
    acc = []

    def frame(i):
        calls["n"] += 1
        if i == 1 and calls["n"] == 2:  # iteration 1 fails once
            raise RuntimeError("transient FAILED_PRECONDITION")
        return jnp.float32(i)

    ckpts = []
    sup = RenderSupervisor(max_retries=1, backoff_s=0.0,
                           checkpoint=lambda: ckpts.append(len(acc)),
                           log=lambda m: None)
    sup.run(frame, 0, 3, lambda i, v: acc.append((i, float(v))))

    # every iteration landed exactly once, in order, despite the fault
    assert acc == [(0, 0.0), (1, 1.0), (2, 2.0)]
    assert sup.failures == 1
    # the salvage checkpoint ran at the failure point (1 iter accumulated)
    assert ckpts == [1]


def test_supervisor_exhausts_retries_and_raises():
    def frame(i):
        raise RuntimeError("hard fault")

    ckpts = []
    sup = RenderSupervisor(max_retries=2, backoff_s=0.0,
                           checkpoint=lambda: ckpts.append(1),
                           log=lambda m: None)
    with pytest.raises(RuntimeError, match="hard fault"):
        sup.run(frame, 0, 1, lambda i, v: None)
    # initial attempt + 2 retries, each salvaged
    assert sup.failures == 3
    assert ckpts == [1, 1, 1]


def test_supervisor_zero_retries_fails_fast():
    sup = RenderSupervisor(max_retries=0, backoff_s=0.0, log=lambda m: None)
    with pytest.raises(ValueError):
        sup.run(lambda i: (_ for _ in ()).throw(ValueError("x")),
                0, 1, lambda i, v: None)
    assert sup.failures == 1


def test_setup_jax_cache_translates_cpu_env_in_process():
    """A cpu env request must become jax.config.update('jax_platforms') —
    the env forms alone still initialize the axon plugin, which HANGS while
    the TPU is wedged (the round-2 CLI-test outage).  Subprocess so the
    parent's initialized backends don't mask the translation."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("JAX_PLATFORM_NAME", None)
    r = subprocess.run(
        [sys.executable, "-c",
         "from path_tracing_tpu.runtime import setup_jax_cache\n"
         "setup_jax_cache()\n"
         "import jax\n"
         "assert jax.devices()[0].platform == 'cpu', jax.devices()\n"
         "print('cpu-translated')"],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "cpu-translated" in r.stdout


def test_supervisor_on_frame_fault_also_retried():
    # faults in the accumulation step (e.g. a host transfer dying) get the
    # same retry treatment as the render itself
    state = {"fail": True, "acc": 0.0}

    def on_frame(i, v):
        if state["fail"]:
            state["fail"] = False
            raise RuntimeError("transfer error")
        state["acc"] += float(v)

    sup = RenderSupervisor(max_retries=1, backoff_s=0.0, log=lambda m: None)
    sup.run(lambda i: jnp.float32(2.0), 0, 1, on_frame)
    assert state["acc"] == 2.0
