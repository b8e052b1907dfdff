"""Equivalence of the PPM gather's round-4 timing knobs.

PT_TPU_PPM_HP_OUTER / PT_TPU_PPM_CPG / PT_TPU_PPM_EVCHUNK only change the
loop nest / batching of the cell-blocked join (ops/pallas_ppm_gather.py),
never which (hitpoint, event) pairs contribute — so counts must match the
default-knob kernel EXACTLY and flux to f32 reassociation tolerance.
Without this, the hardware A/Bs in tools/hw_sweep.py could "win" by
computing the wrong join.

One test function, one baseline run: interpret-mode cost scales with the
static ``max_cells`` cell loop, so the problem is kept small (B=24,
max_cells=48) and every variant shares the single baseline result.
"""
import os

import jax
import numpy as np

from path_tracing_tpu.config import RenderConfig
from path_tracing_tpu.ops.pallas_ppm_gather import gather_flux_pallas

from test_ppm_gather_kernel import _random_problem, scene  # noqa: F401

# baseline is the DEFAULT env (hp_outer=1 since the round-4 A/B); each
# variant flips one knob — including hp_outer=0, the original loop nest
KNOBS = [
    {"PT_TPU_PPM_HP_OUTER": "0"},
    {"PT_TPU_PPM_CPG": "4"},
    {"PT_TPU_PPM_EVCHUNK": "512"},
    {"PT_TPU_PPM_EVCHUNK": "2048"},
    {"PT_TPU_PPM_COLGATHER": "1"},
]
_ALL = sorted({k for d in KNOBS for k in d})


def test_gather_knobs_equivalent(scene):  # noqa: F811
    cfg = RenderConfig(width=16, height=16)
    rs = np.random.RandomState(23)
    hp, ev = _random_problem(rs, scene, B=24, E=512)
    saved = {k: os.environ.pop(k, None) for k in _ALL}
    try:
        jax.clear_caches()  # knobs are trace-time: drop cached traces
        f0, c0, ov0 = gather_flux_pallas(scene, cfg, hp, ev,
                                         max_cells=48, interpret=True)
        f0, c0 = np.asarray(f0), np.asarray(c0)
        assert int(ov0) == 0 and int(c0.sum()) > 25
        for env in KNOBS:
            for k in _ALL:
                os.environ.pop(k, None)
            os.environ.update(env)
            jax.clear_caches()
            f1, c1, ov1 = gather_flux_pallas(scene, cfg, hp, ev,
                                             max_cells=48, interpret=True)
            assert int(ov1) == 0, env
            np.testing.assert_array_equal(np.asarray(c1), c0, err_msg=str(env))
            np.testing.assert_allclose(np.asarray(f1), f0, rtol=2e-4,
                                       atol=1e-6, err_msg=str(env))
    finally:
        for k in _ALL:
            os.environ.pop(k, None)
            if saved[k] is not None:
                os.environ[k] = saved[k]
        jax.clear_caches()
