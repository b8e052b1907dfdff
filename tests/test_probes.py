"""Correctness pins for the round-5 hardware probe kernels.

These kernels exist to MEASURE design candidates on hardware (bench
``--config texprobe`` / ``--config streamroof``); their refutation rows
only mean something if the probes compute the right thing, so CI pins
them in interpret mode at tiny shapes.
"""
import numpy as np
import pytest


def test_onehot_fetch_kernel_gathers_exactly():
    """The texprobe kernel's one-hot MXU fetch must be an exact gather:
    out[r*12:(r+1)*12, lane] == tab[:, idx[r, lane]].  Imports the SAME
    kernel bench.py times (ops/probes.py) — a drift in the probe fails
    this test, not just the recorded number."""
    import jax.numpy as jnp

    from path_tracing_tpu.ops.probes import onehot_fetch

    rows, D, DC = 8, 1024, 256
    tab = jnp.asarray(np.random.RandomState(0).rand(12, D), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, D, (rows, 128)),
                      jnp.int32)
    f = onehot_fetch(rows, D, DC, interpret=True)
    out = np.asarray(f(tab, idx))
    exp = np.asarray(tab)[:, np.asarray(idx)]            # (12, rows, 128)
    got = out.reshape(rows, 12, 128).transpose(1, 0, 2)
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_stream_nocull_knob_preserves_hits(monkeypatch):
    """PT_TPU_STREAM_NOCULL forces every cluster entered (the exact-count
    roofline mode); hits must be identical to the XLA brute force — the
    knob may only change WORK, never results."""
    import jax

    monkeypatch.setenv("PT_TPU_INTERPRET", "1")
    monkeypatch.setenv("PT_TPU_STREAM_NOCULL", "1")
    jax.clear_caches()
    import jax.numpy as jnp

    from path_tracing_tpu.ops import intersect as I
    from path_tracing_tpu.ops.pallas_intersect import nearest_hit_pallas
    from path_tracing_tpu.scene.obj_loader import load_any_scene

    p = load_any_scene("tests/fixtures/sphere.obj")
    scene = p.to_device()
    k = jax.random.PRNGKey(5)
    B = 256
    ro = jax.random.uniform(k, (B, 3), minval=-0.8, maxval=0.8)
    rd = jax.random.normal(jax.random.fold_in(k, 1), (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    h = nearest_hit_pallas(scene, ro, rd, force_stream=True, interpret=True)
    hx = jax.jit(lambda s, a, b: I.find_closest_hit(s, a, b))(scene, ro, rd)
    same = np.isclose(np.asarray(h["t"]), np.asarray(hx.t),
                      rtol=1e-5, atol=1e-6) | \
        ((np.asarray(h["t"]) >= 1e19) & (np.asarray(hx.t) >= 1e19))
    assert same.mean() > 0.999
    jax.clear_caches()  # the knob is read at trace time; don't leak it
