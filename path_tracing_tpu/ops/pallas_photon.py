"""Persistent Pallas megakernel for the PPM photon trace.

Round-4 attribution (docs/measurements_r4.jsonl, `ppm_no_windows` /
`ppm_no_gather` neuters) showed that ~58% of a config-4 1M-photon pass is
OUTSIDE the gather kernel's window/pair machinery — dominated by the XLA
photon-trace scan (`integrators/ppm.ppm_photon_trace`), whose
``max_light_iters`` full-width bounces each round-trip the ~20-array
wavefront state through HBM exactly like the pre-megakernel PT path did.

This kernel is the photon sibling of ``pallas_shade._wavefront_kernel``
(reference: ``ppm_cu.cu:156-295`` minus the in-pass flux splat, which the
TPU design replaces with the sorted cell-blocked gather): emission
sampling stays OUTSIDE in XLA/Threefry (once per pass — and the sharded
light assignment ``global_index % num_lights`` keeps its single-device
sequence, integrators/ppm.ppm_photon_trace), while the bounce loop runs
in ONE pallas_call per pass — nearest hit, BSDF sample, flux update and
deposit-event emission all stay in VMEM/registers; only the per-bounce
event rows leave the core.

RNG: on-core ``pltpu.prng_random_bits`` (counter-hash under
``PT_TPU_INTERPRET``), so the photon stream differs from the XLA path's
Threefry draws — equivalence is statistical, exactly like the PT/BDPT-eye
megakernels (the estimator is unchanged; renders stay bit-reproducible
per (seed, layout)).  ``PT_TPU_NO_PHOTON_MEGA=1`` reverts to the XLA scan.

Event rows are written DEPTH-SLOTTED (round 5): a photon deposits at most
once per depth value (every deposit is a non-delta bounce, which is
exactly what increments ``dep``), so the event blocks are
``(light_depth * rows, 128)`` — HALF the old ``(max_light_iters * rows,
128)`` iteration-slot layout at the bench shape (delta budget = depth) —
and each bounce writes slot ``dep`` via per-slot predicated RMW (Mosaic
has no per-lane dynamic sublane scatter; ``pl.when(any(sel))`` skips the
slots no lane is at).  This is VERDICT r4 item 1's "emit events
pre-binned from the megakernel": the XLA sort/pack that follows
(`integrators/ppm.gather_flux` prep — cell-key argsort + row gather) now
runs over half the rows, and the freed VMEM lets the tile go back to 128
rows.  Tiles whose photons all died exit the while loop early, leaving
the pre-zeroed ``valid`` rows (the gather keys invalid rows to the BIG
sentinel and zeroes their payload at pack time, so garbage in the dead
rows' other fields is unreachable).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import Scene
from .math3 import EPSILON
from .pallas_intersect import LANE, _ray_specs, _tile, interp_forced, \
    mega_rows, pack_scene, super_table
from .pallas_shade import (V3, _draws, bsdf_sample_k, dot3,
                           nearest_hit_inline, valid3, where3)


def photon_mega_enabled(scene: Scene) -> bool:
    """The photon megakernel needs VMEM-resident tables and the on-core
    PRNG (interpret mode substitutes the counter hash, so CPU tests run
    it too).  PT_TPU_NO_PHOTON_MEGA=1 falls back to the XLA scan (A/B +
    the exact-Threefry path the NumPy oracle transcribes)."""
    from .intersect import use_pallas, vmem_tris_ok

    if os.environ.get("PT_TPU_NO_PHOTON_MEGA") == "1":
        return False
    return use_pallas() and vmem_tris_ok(scene)


def _photon_kernel(sph_ref, tri_ref, cl_ref, sup_ref, seed_ref,
                   rox, roy, roz, rdx, rdy, rdz, flx, fly, flz, alv,
                   epx, epy, epz, enx, eny, enz, ewx, ewy, ewz,
                   efx, efy, efz, evd,
                   *, ns, nl, nt, light_depth, iters, rows, slots,
                   use_super):
    seed = seed_ref[0] + pl.program_id(0)
    if not interp_forced():
        pltpu.prng_seed(seed)

    ro = V3(rox[...], roy[...], roz[...])
    rd = V3(rdx[...], rdy[...], rdz[...])
    flux = V3(flx[...], fly[...], flz[...])
    zero = ro.x * 0.0
    zero_i = zero.astype(jnp.int32)

    # pre-zero the validity rows: tiles can exit the loop early and the
    # gather must treat the unwritten slots as empty
    evd[...] = jnp.zeros((slots * rows, LANE), jnp.float32)

    def cond(c):
        (it, work, *_rest) = c
        return (it < iters) & (work != 0)

    def body(c):
        (it, _work, ro, rd, flux, eta, dep, alive_i) = c
        u = _draws(ro.x.shape, 3, seed, it)
        alive = alive_i != 0

        t, n, mtl, flag = nearest_hit_inline(
            sph_ref, tri_ref, cl_ref, sup_ref, ro, rd,
            ns=ns, nl=nl, nt=nt, use_super=use_super)
        hit = flag > 0
        act = alive & hit & (flag != 2) & (dep < light_depth)
        pos = ro + rd.scale(t)
        wi_light = -rd

        depositable = (act & (mtl.eta <= 0.0)
                       & ((mtl.metal < 0.99) | (mtl.rough > 0.01)))

        # ---- emit this bounce's deposit event ----
        if slots < iters:
            # DEPTH-slotted (default): a lane deposits at most once per
            # dep value (deposits are non-delta bounces, which increment
            # dep), so slot `dep` is collision-free; per-slot predicated
            # RMW because Mosaic has no per-lane sublane scatter.
            # pl.when skips slots no lane is at (depths concentrate:
            # most iterations touch 1-2 slots).
            for s in range(slots):
                sel = depositable & (dep == s)

                @pl.when(jnp.any(sel))
                def _(s=s, sel=sel):
                    w = pl.ds(s * rows, rows)
                    for ref, v in ((epx, pos.x), (epy, pos.y),
                                   (epz, pos.z),
                                   (enx, n.x), (eny, n.y), (enz, n.z),
                                   (ewx, wi_light.x), (ewy, wi_light.y),
                                   (ewz, wi_light.z),
                                   (efx, flux.x), (efy, flux.y),
                                   (efz, flux.z)):
                        ref[w] = jnp.where(sel, v, ref[w])
                    evd[w] = jnp.where(sel, 1.0, evd[w])
        else:
            # iteration-slotted (PT_TPU_PPM_DEPTH_SLOTS=0 A/B revert):
            # one unconditional write per bounce at sublane it*rows
            r0 = pl.multiple_of(it * rows, rows)
            w = pl.ds(r0, rows)
            for ref, v in ((epx, pos.x), (epy, pos.y), (epz, pos.z),
                           (enx, n.x), (eny, n.y), (enz, n.z),
                           (ewx, wi_light.x), (ewy, wi_light.y),
                           (ewz, wi_light.z),
                           (efx, flux.x), (efy, flux.y), (efz, flux.z)):
                ref[w] = v
            evd[w] = depositable.astype(jnp.float32)

        # ---- bounce (ppm_cu.cu:265-293 semantics via bsdf_sample_k) ----
        wi_w, val, pdf, is_delta, new_eta = bsdf_sample_k(
            mtl, wi_light, n, u[0], u[1], u[2], eta)
        ok = act & (pdf > 0.0)           # photon pass kills pdf<=0 deltas
        cos_wi = jnp.abs(dot3(n, wi_w))
        scale = jnp.where(is_delta, 1.0, cos_wi / jnp.maximum(pdf, 1e-20))
        new_flux = V3(flux.x * val.x * scale, flux.y * val.y * scale,
                      flux.z * val.z * scale)
        alive_new = ok & valid3(new_flux)

        off_sgn = jnp.where(dot3(wi_w, n) < 0.0, -EPSILON, EPSILON)
        new_ro = V3(pos.x + n.x * off_sgn, pos.y + n.y * off_sgn,
                    pos.z + n.z * off_sgn)
        ro = where3(ok, new_ro, ro)
        rd = where3(ok, wi_w, rd)
        flux = where3(ok, new_flux, flux)
        eta = jnp.where(ok, new_eta, eta)
        dep = dep + jnp.where(is_delta, 0, 1)
        alive_out = act & alive_new
        work = jnp.any(alive_out).astype(jnp.int32)
        return (it + 1, work, ro, rd, flux, eta, dep,
                alive_out.astype(jnp.int32))

    init = (jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32),
            ro, rd, flux, 1.0 - zero, zero_i, (alv[...] != 0).astype(
                jnp.int32))
    jax.lax.while_loop(cond, body, init)


def photon_trace_pallas(scene: Scene, cfg, ro, rd, flux, real, key):
    """Bounce-trace ``P`` photons (pre-sampled emission ``ro/rd/flux``,
    ``real`` = lanes that exist) and return the flat deposit-event arrays
    ``(pos, normal, wi, flux, valid)`` with ``E = slots * P_padded`` rows
    (slots = light_depth by default — the depth-slotted layout; iters
    under PT_TPU_PPM_DEPTH_SLOTS=0) in (tile, slot, row, lane) order —
    the gather sorts by cell key, so event order is immaterial."""
    P = ro.shape[0]
    sph_tab, tri_tab, cl_tab, ns, nl, nt = pack_scene(scene)
    cl_tab, sup_tab, use_super = super_table(cl_tab)
    iters = cfg.max_light_iters
    # depth-slotted event blocks: deposits per photon <= light_depth (see
    # module docstring), so the event tensor is (slots*rows, 128) per
    # field — half the iteration-slot layout at the bench shape.
    # PT_TPU_PPM_DEPTH_SLOTS=0 reverts to the round-4 iteration slots
    # (same-session A/B; the gather is layout-agnostic either way)
    if os.environ.get("PT_TPU_PPM_DEPTH_SLOTS", "1") == "0":
        slots = int(iters)
    else:
        slots = max(1, min(int(cfg.light_depth), int(iters)))
    rows = mega_rows(P)
    # VMEM budget: the 13 (slots*rows, LANE) event blocks and the 10 ray
    # blocks are double-buffered by the output pipeline; the old
    # iteration-slot layout at rows=128/iters=8 landed 64 KiB OVER the
    # 16 MiB scoped limit (measured r4: "scoped allocation 16.06M >
    # 16.00M").  Shrink rows until the formula fits 12 MiB.  NOTE the
    # formula UNDERESTIMATES the compiler's real footprint by ~11%
    # (predicted 14.94 MiB vs 16.06 measured at rows=128, 8 slots), so
    # the 12 MiB target really buys ~13.3 MiB actual — keep that margin
    # in mind before trusting the formula for future edits.  At the
    # depth-slotted slots=4 the formula passes at the full rows=128
    # (8.1 MiB predicted).
    while rows > 8 and (2 * (13 * slots + 10) * rows * LANE * 4
                        > 12 * 2**20):
        rows -= 8

    comps = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
             flux[:, 0], flux[:, 1], flux[:, 2],
             real.astype(jnp.int32)]
    tiled = [_tile(c, rows)[0] for c in comps]
    rows_total = tiled[0].shape[0]
    grid = rows_total // rows

    seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    kernel = functools.partial(
        _photon_kernel, ns=ns, nl=nl, nt=nt, light_depth=cfg.light_depth,
        iters=iters, rows=rows, slots=slots, use_super=use_super)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(sph_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cl_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sup_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *_ray_specs(len(comps), rows),
        ],
        out_specs=[pl.BlockSpec((slots * rows, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in range(13)],
        out_shape=[jax.ShapeDtypeStruct((grid * slots * rows, LANE),
                                        jnp.float32) for _ in range(13)],
        interpret=interp_forced(),
    )(sph_tab, tri_tab, cl_tab, sup_tab,
      seed.reshape(1), *tiled)
    flat = [o.reshape(-1) for o in outs]
    pos = jnp.stack(flat[0:3], axis=-1)
    normal = jnp.stack(flat[3:6], axis=-1)
    wi = jnp.stack(flat[6:9], axis=-1)
    fl = jnp.stack(flat[9:12], axis=-1)
    valid = flat[12] > 0.0
    return pos, normal, wi, fl, valid
