"""Hardware-probe kernels shared by bench.py and their CI correctness
pins (tests/test_probes.py import the SAME kernel the bench times, so a
drift in the probe invalidates the test, not just the recorded number).

``onehot_fetch``: the in-megakernel texture-fetch candidate (VERDICT r4
item 6) — per 128-lane tile row, gather 12 table columns (4 bilinear
taps x RGB) for each lane's flat texel index as a one-hot MXU
contraction, the only Mosaic-legal per-lane gather.  `bench.py --config
texprobe` times it; the measured 0.529 ms/tile at a 64^2 atlas against
the megakernel's ~1.1 ms tile-bounce budget is what refuted the tier.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_fetch_kernel(tab_ref, idx_ref, out_ref, *, rows, D, DC):
    def row(r, _):
        n = idx_ref[pl.ds(r, 1), :]                       # (1, 128)
        acc = jnp.zeros((12, 128), jnp.float32)

        def dchunk(k, acc):
            base = k * DC
            sub = jax.lax.broadcasted_iota(jnp.int32, (DC, 128), 0) + base
            oh = (sub == n).astype(jnp.float32)           # (DC, 128)
            return acc + jnp.dot(tab_ref[:, pl.ds(k * DC, DC)], oh,
                                 preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, D // DC, dchunk, acc)
        out_ref[pl.ds(r * 12, 12), :] = acc
        return 0

    jax.lax.fori_loop(0, rows, row, 0)


def onehot_fetch(rows: int, D: int, DC: int, interpret: bool = False):
    """Build the one-hot fetch pallas_call: (tab (12, D), idx (rows, 128))
    -> (rows*12, 128) where out[r*12:(r+1)*12, l] == tab[:, idx[r, l]]."""
    assert D % DC == 0
    return pl.pallas_call(
        functools.partial(_onehot_fetch_kernel, rows=rows, D=D, DC=DC),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows * 12, 128), jnp.float32),
        interpret=interpret,
    )
