"""Pallas TPU kernel for the PPM photon-flux gather (the hot join).

The XLA gather in integrators/ppm.gather_flux samples candidate photon
events with per-(hitpoint, cell) random row gathers from an ~8M-row HBM
table — 27 cells x 32 strata x 262k hitpoints of uncoalesced 48-byte reads
dominate a PPM pass (6.5 s of a 6.8 s pass at 512^2 / 1M photons).

This kernel restructures the join around the *cells* (the reference's unit
of locality, ppm_cu.cu:225-263) so every HBM byte is read once per cell
instead of once per hitpoint, and the pair math runs as dense
(8 hitpoints x 128 events) vector blocks:

1.  Events and hitpoints are sorted by a lexicographic integer cell key
    (``(ix*G + iy)*G + iz``; collision-free inside any 27-neighborhood,
    unlike the reference's spatial hash whose rare in-neighborhood
    collisions double-count — see integrators/ppm docstring).  Sorting is
    one multi-operand ``lax.sort`` — no gathers.
2.  For every occupied *hitpoint* cell the 27 neighbor cells collapse to
    9 contiguous key ranges (dx,dy fixed; dz in {-1,0,1} is key +-1), found
    with ``searchsorted`` per cell (a few thousand queries, not millions).
3.  The kernel walks occupied cells as its grid.  Per cell it DMAs the
    cell's hitpoint rows and each neighbor-window's event chunks into VMEM
    once, then evaluates hitpoint x event pair blocks entirely in
    registers: distance/normal gates, local-frame BSDF eval
    (geometric.cuh:419-456), flux deposit and photon count — the exact
    candidate set, with no per-cell budget and no stratified subsampling.

Event windows are 128-aligned and over-fetched; a per-pair key gate
(``ev_key in [cell_key + off - 1, cell_key + off + 1]``) discards alien
rows, which also makes axis wraparound at the grid boundary harmless
(aliased cells are far away and additionally fail the distance test).

Mosaic constraints shaped the layout: no dynamic *lane* indexing exists,
so per-cell scalars arrive as an SMEM-blocked ``(1, 1, 32)`` meta row,
hitpoints are row-major ``(128, 32)`` blocks sliced on the sublane axis
(``pl.multiple_of`` 8-aligned), and accumulation is vector row-sums into
``(128, 8)`` VMEM — never scalar stores.

The grid covers at most ``cfg.ppm_max_cells`` occupied hitpoint cells;
hitpoints beyond that (never seen in practice: input.txt 512^2 occupies
~5.5k cells) are dropped and reported via the returned overflow count.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene.types import Scene
from .frame import build_local_frame, world_to_local
from .microfacet import roughness_to_alpha
from .pallas_shade import (V3, fr_dielectric, fr_schlick, tr_lambda,
                           valid3, where3)

# G^3 = 8.0M < 2^23 keeps every cell key exact in ONE f32 table row (f32
# holds integers to 2^24; the previous 1024^3 domain needed two 15-bit
# halves = two DMA rows and a 4-op int reassembly per pair block).  The
# key domain shrank 1024 -> 200 cells/axis, but cells are radius-sized
# anyway: only scenes wider than 196 radii see coarser (still exact,
# merely less selective) cells, vs 1020 radii before.
G = 200                  # cells per axis in the packed key domain
# sentinel key for invalid rows: f32-exact (2^23 - 1) and strictly above
# every window's top (max real key + max offset + 2 = 8,040,201), so
# padded rows can never pass a corner cell's in_cell gate
BIG = 2 ** 23 - 1
EV_CHUNK = 1024          # events per DMA'd chunk (8 sublane-blocks of 128)
# event table rows: 12 data + 1 f32 cell key + 1 zero pad.  Rows 6..13
# ([wi3, n3, key, pad]) double as the (8, 128) MXU operand — K stays 8
# (the proven-on-hardware contraction width) and the key/pad rows are
# nullified by the A operand's zero columns.  The table is BLOCK-major:
# (n_blocks, EV_ROWS, 128) — a chunk DMA is one contiguous leading-dim
# slice, and the kernel's per-block reads index the leading dim with the
# (dynamic) block number, which Mosaic supports everywhere
EV_ROWS = 14
HP_CHUNK = 128           # hitpoints per DMA'd block
# hitpoint sub-block rows per pair block.  PT_TPU_PPM_SUB re-sweeps it
# (re-read at every gather_flux_pallas call, i.e. at trace time after a
# jax.clear_caches(); must divide HP_CHUNK): 16/32/64 measured identical
# under the OLD pair-block nest (round 2); VERDICT r4 item 2 asks for a
# re-sweep under the hp-sub-outer join shipped in round 4.
SUB = 16
# (dx, dy) neighbor offsets in key units; dz is folded into the +-1 range
OFFS = tuple((dx * G + dy) * G for dx in (-1, 0, 1) for dy in (-1, 0, 1))
DZ_LO, DZ_HI = 1, 1      # kernel window: key in [qlo, qlo + DZ_LO + DZ_HI]


def _cell_size(scene: Scene, cfg: RenderConfig):
    """radius-sized cells, grown if the scene outruns the G^3 key domain
    (cell >= radius keeps the 27-neighborhood covering the search ball)."""
    ext = jnp.max(scene.scene_max - scene.scene_min)
    return jnp.maximum(jnp.float32(cfg.ppm_radius), ext / (G - 4))


def _keys(pos, origin, cell):
    c = jnp.floor((pos - origin) / cell).astype(jnp.int32) + 1
    c = jnp.clip(c, 0, G - 1)
    return (c[:, 0] * G + c[:, 1]) * G + c[:, 2]


def _pad_to(x, n, value=0):
    pad = n - x.shape[0]
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], value, x.dtype)], 0)


def _gather_kernel(meta_ref, r2_ref, hp_ref, ev_ref, out_ref,
                   hp_vmem, ev_vmem, acc_vmem, accw_vmem, sems, *,
                   cpg=1, ev_chunk=EV_CHUNK):
    # PT_TPU_PPM_NEUTER (trace-time, BISECT ONLY — flux is wrong):
    # 'pairs' skips all pair math (DMA/loop skeleton remains), 'eval'
    # keeps the gates + MXU rotation but replaces the BSDF eval with a
    # constant, 'windows' skips the ENTIRE per-offset machinery (no
    # window DMA, waits, or loops — leaves hp DMA + zero/reduce/out per
    # cell, isolating the per-cell base from the window machinery).
    # Used by tools/hw_sweep.py to attribute config4's cycles (the
    # round-2 split — 0.26 s skeleton / 0.35 gates / 0.42 eval per
    # 1M-photon pass — came from uncommitted /tmp variants).
    neuter = os.environ.get("PT_TPU_PPM_NEUTER", "")
    r2 = r2_ref[0, 0]
    EB = ev_chunk // 128

    def ev_dma(slot, blk):
        return pltpu.make_async_copy(
            ev_ref.at[pl.ds(blk, EB)], ev_vmem.at[slot],
            sems.at[1 + slot])

    def start_pair(slot, blk):
        ev_dma(slot, blk).start()

    def wait_pair(slot, blk):
        ev_dma(slot, blk).wait()

    # cells-per-grid-step batching: a Pallas grid step costs ~25 us
    # of fixed machinery through this stack (measured r3: the
    # 'windows' neuter left 0.406 s for a 16384-step grid of mostly
    # trivial steps) — processing cpg cells per step divides it
    def do_cell(ci):
        hp_start = meta_ref[ci, 0, 0]
        hp_cnt = meta_ref[ci, 0, 1]

        @pl.when(hp_cnt > 0)
        def _():
            n_hp_blocks = (hp_cnt + HP_CHUNK - 1) // HP_CHUNK

            def hp_block(hb, _):
                base = hp_start + hb * HP_CHUNK
                cp = pltpu.make_async_copy(
                    hp_ref.at[pl.ds(base, HP_CHUNK)], hp_vmem, sems.at[0])
                cp.start()
                # EAGER window prefetch: start every non-empty offset window's
                # first chunk NOW, each into its own slot, so the compute loop
                # below waits ~max(DMA) once instead of sum-of-9 (round-3
                # bisect: the serialized start/wait chain plus per-window
                # stalls were 71% of a 1M-photon pass; empty windows also
                # used to DMA a full stale chunk each)
                if neuter != "windows":
                    for o in range(9):
                        @pl.when(meta_ref[ci, 0, 11 + o] > 0)
                        def _(o=o):
                            start_pair(o, meta_ref[ci, 0, 2 + o])
                cp.wait()
                acc_vmem[...] = jnp.zeros_like(acc_vmem)
                accw_vmem[...] = jnp.zeros_like(accw_vmem)
                nh = jnp.minimum(hp_cnt - hb * HP_CHUNK, HP_CHUNK)
                n_sub = (nh + SUB - 1) // SUB

                def make_sub(sidx, nh=nh):
                    """Per-hitpoint-sub-block context: the (SUB,1) column
                    loads, the (5*SUB,8) MXU operand, the live mask and the
                    material-branch decision — everything that depends only
                    on the sub-block, shared by both loop orders.  Returns
                    (all_simple, run) where ``run(buf_slot, qf, simple_path)``
                    joins the sub-block against one event chunk: the frame
                    rotation + normal dot + wo.wi run as one
                    (5*SUB,8)x(8,128) MXU matmul per event block instead of
                    ~25 VPU broadcast ops."""
                    if True:
                        r0 = pl.multiple_of(sidx * SUB, SUB)
                        sub = pl.ds(r0, SUB)

                        def col(f):
                            return hp_vmem[sub, f:f + 1]  # (SUB, 1)

                        hpx = V3(col(0), col(1), col(2))
                        wo_l = V3(col(12), col(13), col(14))
                        rough, metal, eta = col(18), col(19), col(20)
                        lam_wo = col(25)
                        fs_pre = V3(col(26), col(27), col(28))
                        simple = col(29)
                        dif = V3(col(30), col(31), col(32))
                        alpha2 = col(36)
                        # one MXU operand per sub-block: row blocks
                        # [tangent | bitangent | normal | normal-vs-en |
                        #  wo-vs-ewi] contracted against the CONTIGUOUS event
                        # rows [ewi; en; key; pad] (K = 8): the event operand
                        # is a plain (8, 128) slice — no per-pair-block
                        # reassembly — and zero A-columns 6..7 nullify the
                        # key/pad rows.  Block 5 contracts the WORLD wo
                        # against ewi: wo_l . wi_l == wo_world . ewi (frames
                        # are orthonormal), which feeds the half-vector
                        # algebra below without ever building wh's x/y
                        zp5 = jnp.zeros((SUB, 5), jnp.float32)
                        zp3 = jnp.zeros((SUB, 3), jnp.float32)
                        a_rot = jnp.concatenate([
                            jnp.concatenate([hp_vmem[sub, 6:9], zp5], 1),
                            jnp.concatenate([hp_vmem[sub, 9:12], zp5], 1),
                            jnp.concatenate([hp_vmem[sub, 3:6], zp5], 1),
                            jnp.concatenate([zp3, hp_vmem[sub, 3:6],
                                             jnp.zeros((SUB, 2), jnp.float32)],
                                            1),
                            jnp.concatenate([hp_vmem[sub, 33:36], zp5], 1),
                        ], 0)                                  # (5*SUB, 8)
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (SUB, 1), 0) + r0
                        live = rows < nh
                        # fast path: every live row eta==0 & metal<=0
                        # (fr_dielectric==1 identically; see pack-time
                        # comment).  Cell-sorted hitpoints are spatially
                        # coherent, so blocks are material-uniform in practice
                        all_simple = jnp.all((simple > 0.5) | ~live)

                    def run(buf_slot, qf, simple_path):
                        def pair_block(j):
                            if neuter == "pairs":
                                z = (ev_vmem[buf_slot, j, 0, :]
                                     .reshape(1, 128) * 0.0
                                     + hpx.x * 0.0)
                                return (z, z, z, z)
                            # cell keys ride in the event table as ONE f32 row
                            # (the GXY^2*GZ = 2^23 key domain is f32-exact; a
                            # raw int32 bitcast through f32 would flush keys
                            # < 2^23 as denormals).  Alien rows in over-fetched
                            # 128-blocks (other cells of the sorted table) are
                            # excluded by the key gate; the four flux/count
                            # partials accumulate in REGISTERS across the
                            # block loop (one VMEM RMW per chunk instead of
                            # one per pair block — the RMWs were a measured
                            # third of the kernel)
                            keys = ev_vmem[buf_slot, j, 12, :].reshape(1, 128)
                            in_cell = (keys >= qf) & (keys <= qf + (DZ_LO
                                                                    + DZ_HI))
                            ep = V3(ev_vmem[buf_slot, j, 0, :].reshape(1, 128),
                                    ev_vmem[buf_slot, j, 1, :].reshape(1, 128),
                                    ev_vmem[buf_slot, j, 2, :].reshape(1, 128))
                            efl = V3(
                                ev_vmem[buf_slot, j, 3, :].reshape(1, 128),
                                ev_vmem[buf_slot, j, 4, :].reshape(1, 128),
                                ev_vmem[buf_slot, j, 5, :].reshape(1, 128))
                            rot = jax.lax.dot_general(
                                a_rot, ev_vmem[buf_slot, j, 6:14, :],
                                (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                            wi_l = V3(rot[0:SUB], rot[SUB:2 * SUB],
                                      rot[2 * SUB:3 * SUB])
                            ndot = rot[3 * SUB:4 * SUB]
                            dws = rot[4 * SUB:5 * SUB]     # wo_l . wi_l

                            dx = hpx.x - ep.x              # (SUB, 128)
                            dy = hpx.y - ep.y
                            dz = hpx.z - ep.z
                            dist2 = dx * dx + dy * dy + dz * dz
                            ok = (in_cell & (dist2 < r2)
                                  & (ndot > 0.01) & live)
                            if neuter == "eval":
                                # bisect: gates + MXU rotation, constant eval
                                okf = ok.astype(jnp.float32)
                                v = okf * (1e-6 + dws * 0.0 + wi_l.z * 0.0)
                                return (efl.x * v, efl.y * v, efl.z * v, okf)

                            # ---- shared pair terms (eval_local with the
                            # per-hp factors hoisted to pack time, and the
                            # half-vector reduced to its z component: both
                            # wo_l and wi_l are unit, so |wo+wi|^2 = 2+2*dws
                            # and wh.z = (wo.z+wi.z)/sqrt(l2); D and G need
                            # only z's, and ci = wo.wh = (1+dws)/sqrt(l2)
                            # (sign-flipped with wh's z<0 flip) ----
                            s3z = wo_l.z + wi_l.z
                            l2 = 2.0 + 2.0 * dws
                            wh_ok = l2 >= 1e-12
                            rl = jax.lax.rsqrt(jnp.maximum(l2, 1e-40))
                            whz = s3z * rl
                            ci = jnp.where(s3z < 0.0, -(1.0 + dws) * rl,
                                           (1.0 + dws) * rl)
                            zero_cos = (wo_l.z == 0.0) | (wi_l.z == 0.0)
                            prod_z = wo_l.z * wi_l.z
                            same = prod_z > 0.0
                            # tr_d on wh.z^2 (flip-invariant)
                            c2h = whz * whz
                            s2h = jnp.maximum(0.0, 1.0 - c2h)
                            t2h = s2h / (c2h + 1e-7)
                            cos4 = c2h * c2h
                            e = cos4 * (alpha2 + t2h * t2h)
                            d = alpha2 / (jnp.pi * e)
                            d = jnp.where(jnp.isinf(t2h) | (e < 1e-12), 0.0, d)
                            # tr_lambda(wi) without the sqrt(s2):
                            # (alpha*|tan|)^2 == alpha^2*s2/(z+1e-7)^2
                            c2w = wi_l.z * wi_l.z
                            s2w = jnp.maximum(0.0, 1.0 - c2w)
                            den = wi_l.z + 1e-7
                            a2t2 = alpha2 * s2w / (den * den)
                            lam_wi = jnp.where(
                                den == 0.0, 0.0,
                                (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0)
                            g = 1.0 / (1.0 + lam_wo + lam_wi)
                            denom = jnp.maximum(
                                4.0 * jnp.abs(wo_l.z) * jnp.abs(wi_l.z),
                                1e-4)
                            sg = d * g / denom
                            zv = jnp.zeros_like(sg)
                            dif_g = where3(prod_z < 0.0, V3(zv, zv, zv),
                                           V3(dif.x + zv, dif.y + zv,
                                              dif.z + zv))

                            if simple_path:
                                ci_cl = jnp.clip(ci, -1.0, 1.0)
                                # fr_dielectric's NaN edges for eta=0
                                nan_edge = (ci_cl >= 1.0) | (ci_cl == 0.0)
                                outv = where3(
                                    same, V3(dif_g.x + sg, dif_g.y + sg,
                                             dif_g.z + sg), dif_g)
                                kill = zero_cos | ~wh_ok
                                brdf = where3(kill, V3(zv, zv, zv), outv)
                                extra_drop = same & nan_edge
                            else:
                                smooth_diel = (eta > 0.0) & (rough < 0.001)
                                fr = fr_dielectric(ci, jnp.ones_like(eta),
                                                   eta)
                                f = where3(metal > 0.0, fs_pre,
                                           V3(fr, fr, fr))
                                spec = V3(f.x * sg, f.y * sg, f.z * sg)
                                outv = where3(
                                    same, V3(dif_g.x + spec.x,
                                             dif_g.y + spec.y,
                                             dif_g.z + spec.z), dif_g)
                                kill = zero_cos | smooth_diel | ~wh_ok
                                brdf = where3(kill, V3(zv, zv, zv), outv)
                                extra_drop = jnp.zeros_like(same)

                            if simple_path:
                                # NaN/Inf are impossible here: d is 0-gated on
                                # its e<1e-12 edge, g = 1/(1+lam) with lam in
                                # [0, inf] (a2t2's 0/0 needs s2w==0 AND den==0,
                                # which contradict), denom >= 1e-4, dif is a
                                # finite pack-time product — only NEGATIVE
                                # albedo (valid3's third clause) can occur
                                nonneg = ((brdf.x >= 0.0) & (brdf.y >= 0.0)
                                          & (brdf.z >= 0.0))
                                okb = ok & nonneg & ~extra_drop
                            else:
                                okb = ok & valid3(brdf) & ~extra_drop
                            okf = okb.astype(jnp.float32)
                            # sanitize BEFORE the product: a NaN brdf on an
                            # excluded pair would poison the row sum —
                            # 0 * NaN = NaN.  (bx is already 0 on excluded
                            # pairs, so the flux partials need no extra okf
                            # factor; event tables are NaN-free by pack-time
                            # zeroing, so efl * 0 stays 0.)
                            bx = jnp.where(okb, brdf.x, 0.0)
                            by = jnp.where(okb, brdf.y, 0.0)
                            bz = jnp.where(okb, brdf.z, 0.0)
                            return (efl.x * bx, efl.y * by, efl.z * bz, okf)

                        # WIDE (row, lane) partials carried in registers over
                        # the STATICALLY UNROLLED block loop; ONE VMEM RMW per
                        # channel per chunk.  Lane reduction and the
                        # throughput multiply are deferred to once per hp
                        # block.  A dynamic loop over only the live blocks
                        # (n_live from the window size) was tried in round 3
                        # and REGRESSED the full pass 1.477 -> 1.285 Mphotons/s
                        # (docs/measurements_r3.jsonl ppm_fast): the dynamic
                        # trip count defeats Mosaic's cross-block software
                        # pipelining and forces dynamic scratch indexing,
                        # costing more than the ~1/3 of pair math the dead
                        # blocks burn.  Dead/alien blocks are excluded by
                        # VALUE (the key gate — over-fetched rows are other
                        # cells of the sorted table or BIG-key padding).
                        acc = list(pair_block(0))
                        for j in range(1, EB):
                            part = pair_block(j)
                            for c in range(4):
                                acc[c] = acc[c] + part[c]
                        for c in range(4):
                            accw_vmem[c, sub, :] += acc[c]

                    return all_simple, run

                def compute_chunk(buf_slot, qlo, n_sub=n_sub):
                    """Join EV_CHUNK events (VMEM slot) x this cell's
                    hitpoints, hitpoint sub-block OUTER / event block inner."""
                    qf = qlo.astype(jnp.float32)               # hoisted scalar

                    def hp_sub(sidx, _):
                        all_simple, run = make_sub(sidx)

                        @pl.when(all_simple)
                        def _():
                            run(buf_slot, qf, True)

                        @pl.when(~all_simple)
                        def _():
                            run(buf_slot, qf, False)
                        return 0

                    jax.lax.fori_loop(0, n_sub, hp_sub, 0)

                # static offset loops: VMEM slot indices must be compile-time
                # (dynamic-slot full-buffer reads miscompile on Mosaic); every
                # window's first chunk is already in flight (eager prefetch
                # above), one slot per offset
                # DEFAULT 1 (round-4 hardware A/B, results-r4-s2: 1.595
                # vs 1.555 Mphotons/s on the 1M-photon config4 pass —
                # the per-sub column loads + MXU-operand build amortize
                # over all 9 windows).  PT_TPU_PPM_HP_OUTER=0 reverts.
                hp_outer = os.environ.get("PT_TPU_PPM_HP_OUTER", "1") == "1"
                if hp_outer and neuter != "windows":
                    # A/B (round 3): hitpoint-sub OUTER x offsets INNER — the
                    # per-sub column loads + MXU-operand build amortize over
                    # all 9 windows instead of rebuilding per window
                    for o in range(9):
                        @pl.when(meta_ref[ci, 0, 11 + o] > 0)
                        def _(o=o):
                            wait_pair(o, meta_ref[ci, 0, 2 + o])

                    def hp_sub_all(sidx, _):
                        all_simple, run = make_sub(sidx)
                        for o in range(9):
                            asize = meta_ref[ci, 0, 11 + o]
                            qf = meta_ref[ci, 0, 20 + o].astype(jnp.float32)

                            @pl.when((asize > 0) & all_simple)
                            def _(o=o, qf=qf):
                                run(o, qf, True)

                            @pl.when((asize > 0) & ~all_simple)
                            def _(o=o, qf=qf):
                                run(o, qf, False)
                        return 0

                    jax.lax.fori_loop(0, n_sub, hp_sub_all, 0)
                    # rare multi-chunk windows drain in the chunk-outer order
                    for o in range(9):
                        asize = meta_ref[ci, 0, 11 + o]

                        @pl.when(asize > ev_chunk)
                        def _(o=o, asize=asize):
                            astart = meta_ref[ci, 0, 2 + o]
                            qlo = meta_ref[ci, 0, 20 + o]
                            n_chunks = (asize + ev_chunk - 1) // ev_chunk

                            def extra_chunk(k, _):
                                start_pair(9, astart + k * EB)
                                wait_pair(9, astart + k * EB)
                                compute_chunk(9, qlo)
                                return 0

                            jax.lax.fori_loop(1, n_chunks, extra_chunk, 0)

                for o in range(9) if (neuter != "windows" and not hp_outer) \
                        else ():
                    astart = meta_ref[ci, 0, 2 + o]
                    asize = meta_ref[ci, 0, 11 + o]
                    qlo = meta_ref[ci, 0, 20 + o]

                    @pl.when(asize > 0)
                    def _(o=o, astart=astart, asize=asize, qlo=qlo):
                        wait_pair(o, astart)
                        compute_chunk(o, qlo)
                        n_chunks = (asize + ev_chunk - 1) // ev_chunk

                        # rare multi-chunk windows drain synchronously (slot 9)
                        def extra_chunk(k, _, astart=astart, qlo=qlo):
                            start_pair(9, astart + k * EB)
                            wait_pair(9, astart + k * EB)
                            compute_chunk(9, qlo)
                            return 0

                        jax.lax.fori_loop(1, n_chunks, extra_chunk, 0)

                # deferred lane reduction + throughput multiply, whole block
                for c, tpc in ((0, 21), (1, 22), (2, 23)):
                    acc_vmem[:, c:c + 1] = (
                        jnp.sum(accw_vmem[c], axis=1, keepdims=True)
                        * hp_vmem[:, tpc:tpc + 1])
                acc_vmem[:, 3:4] = jnp.sum(accw_vmem[3], axis=1, keepdims=True)

                cp = pltpu.make_async_copy(
                    acc_vmem, out_ref.at[pl.ds(base, HP_CHUNK)], sems.at[11])
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, n_hp_blocks, hp_block, 0)

    for _ci in range(cpg):
        do_cell(_ci)


def gather_flux_pallas(scene: Scene, cfg: RenderConfig, hp, events,
                       r2_scale=1.0, max_cells: int | None = None,
                       interpret: bool = False):
    """Exact per-hitpoint flux gather.  Same contract as
    ``integrators.ppm.gather_flux`` -> (flux (B,3), count (B,), overflow ())
    except the gather is exact (no cell budget / stratification) and
    ``overflow`` counts hitpoints dropped by the ``max_cells`` grid cap
    plus valid events dropped by ``cfg.ppm_event_cap_frac`` (0 means the
    gather covered everything).
    """
    from .pallas_intersect import interp_forced
    interpret = interpret or interp_forced()
    # SUB is a module global referenced by the kernel at trace time;
    # re-read the sweep knob here so PT_TPU_PPM_SUB + jax.clear_caches()
    # takes effect without re-importing the module
    global SUB
    SUB = int(os.environ.get("PT_TPU_PPM_SUB", "16"))
    assert HP_CHUNK % SUB == 0, f"PT_TPU_PPM_SUB={SUB} must divide 128"
    cmax = int(max_cells or cfg.ppm_max_cells)
    origin = scene.scene_min
    cell = _cell_size(scene, cfg)
    r2 = jnp.float32(cfg.ppm_radius * cfg.ppm_radius) * r2_scale

    # ---- events: sort by cell key, pack field-major -------------------
    E = events.pos.shape[0]
    ekey = jnp.where(events.valid, _keys(events.pos, origin, cell),
                     jnp.int32(BIG))
    # row order [pos3, flux3, wi3, normal3]: rows 6..11 form the (6, 128)
    # MXU operand [wi; n] as ONE contiguous slice — the kernel's pair
    # blocks used to re-concatenate it from two strided reads per block
    ev_cols = [events.pos[:, 0], events.pos[:, 1], events.pos[:, 2],
               events.flux[:, 0], events.flux[:, 1], events.flux[:, 2],
               events.wi[:, 0], events.wi[:, 1], events.wi[:, 2],
               events.normal[:, 0], events.normal[:, 1],
               events.normal[:, 2]]
    # argsort + one row gather: variadic lax.sort at multi-M sizes takes
    # minutes of XLA compile time; this compiles in seconds and the gather
    # runs once per pass.  Invalid rows carry key BIG and sort to the end,
    # so truncating the order to a static cap compacts the tensor for free
    # (the argsort over all E keys is ~0.07 s; the row gather + transpose
    # below are the expensive part and now run at the capped size).
    # events per DMA'd chunk — PT_TPU_PPM_EVCHUNK A/B (trace-time): 512
    # halves dead-lane over-fetch for sub-chunk windows but pushes more
    # windows onto the synchronous multi-chunk drain; 2048 the reverse
    ev_chunk = int(os.environ.get("PT_TPU_PPM_EVCHUNK", str(EV_CHUNK)))
    ev_chunk = max(128, (ev_chunk // 128) * 128)
    frac = getattr(cfg, "ppm_event_cap_frac", None)
    frac = 1.0 if frac is None else min(max(float(frac), 0.0), 1.0)
    cap = min(E, max(ev_chunk, int(-(-E * frac // ev_chunk)) * ev_chunk))
    eorder = jnp.argsort(ekey)[:cap]
    skey = ekey[eorder]
    n_valid_ev = jnp.sum(events.valid.astype(jnp.int32))
    ev_dropped = jnp.maximum(n_valid_ev - cap, 0)
    Ep = ((cap + ev_chunk - 1) // ev_chunk + 1) * ev_chunk
    # keys travel inside the event table as ONE f32 row — every key in the
    # GXY^2*GZ = 2^23 domain is f32-exact (a raw int32 bitcast through an
    # f32 column would silently corrupt keys < 2^23: TPU flushes denormals)
    skey_p = _pad_to(skey, Ep, BIG)
    # invalid rows in the capped tail can share a 128-block with the last
    # valid window; their values may be NaN (dead-photon flux) and 0*NaN
    # would poison the row sums — zero them (fused into the gathers)
    ev_valid = skey < BIG
    if os.environ.get("PT_TPU_PPM_COLGATHER") == "1":
        # REFUTED round-4 alternative (kept A/B-able): build block-major
        # directly from 12 flat 1-D gathers — no (E, 12) row gather, no
        # transpose.  Hardware says XLA TPU lowers flat 1-D gathers FAR
        # worse than the single multi-column row gather: prep-only
        # ('ppm_no_kernel') 0.297 -> 0.672 s/M, full 1-pass 1.78 ->
        # 1.02 Mphotons/s.  The row gather IS the fast form.
        nb = Ep // 128
        planes = [
            _pad_to(jnp.where(ev_valid, c[eorder], 0.0), Ep).reshape(
                nb, 128)
            for c in ev_cols]
        planes.append(skey_p.astype(jnp.float32).reshape(nb, 128))
        planes.append(jnp.zeros((nb, 128), jnp.float32))
        ev_tab = jnp.stack(planes, axis=1)
    else:
        # one (E, 12) row gather, then a block transpose into the
        # (n_blocks, EV_ROWS, 128) layout
        ev_mat = jnp.stack(ev_cols, axis=1)[eorder]        # (cap, 12)
        ev_mat = jnp.where(ev_valid[:, None], ev_mat, 0.0)
        ev_mat = jnp.concatenate(
            [_pad_to(ev_mat, Ep), skey_p.astype(jnp.float32)[:, None],
             jnp.zeros((Ep, 1), jnp.float32)], axis=1)
        ev_tab = ev_mat.reshape(Ep // 128, 128, EV_ROWS).transpose(0, 2, 1)

    # ---- hitpoints: precompute frame, sort, pack row-major -------------
    B = hp.pos.shape[0]
    hkey = jnp.where(hp.valid, _keys(hp.pos, origin, cell), jnp.int32(BIG))
    tf, bf = build_local_frame(hp.normal)
    wo_l = world_to_local(hp.wo, tf, bf, hp.normal)
    alpha = roughness_to_alpha(hp.mtl.roughness)
    # per-hitpoint eval terms hoisted out of the pair loop (cols 25-32):
    # tr_lambda(wo), the schlick fresnel, the "simple material" flag, and
    # the diffuse albedo depend only on hitpoint fields — the kernel would
    # otherwise recompute them per (hitpoint, event) pair (measured as part
    # of the eval third of the kernel)
    wo_l_v = V3(wo_l[:, 0], wo_l[:, 1], wo_l[:, 2])
    lam_wo = tr_lambda(wo_l_v, alpha)
    fs_pre = fr_schlick(jnp.abs(wo_l[:, 2]),
                        V3(hp.mtl.base_color[:, 0],
                           hp.mtl.base_color[:, 1],
                           hp.mtl.base_color[:, 2]))
    # eta==0 & metal<=0 rows take the kernel's fast eval path: for eta=0
    # the reference's fr_dielectric is identically 1 (TIR branch) except
    # the ci>=1 / ci==0 NaN edges, which the kernel gates explicitly
    simple = ((hp.mtl.eta == 0.0)
              & (hp.mtl.metallic <= 0.0)).astype(jnp.float32)
    kd = (1.0 - hp.mtl.metallic) / jnp.pi
    hp_cols = [hp.pos[:, 0], hp.pos[:, 1], hp.pos[:, 2],
               hp.normal[:, 0], hp.normal[:, 1], hp.normal[:, 2],
               tf[:, 0], tf[:, 1], tf[:, 2],
               bf[:, 0], bf[:, 1], bf[:, 2],
               wo_l[:, 0], wo_l[:, 1], wo_l[:, 2],
               hp.mtl.base_color[:, 0], hp.mtl.base_color[:, 1],
               hp.mtl.base_color[:, 2],
               hp.mtl.roughness, hp.mtl.metallic, hp.mtl.eta,
               hp.throughput[:, 0], hp.throughput[:, 1],
               hp.throughput[:, 2], alpha,
               lam_wo, fs_pre.x, fs_pre.y, fs_pre.z, simple,
               hp.mtl.base_color[:, 0] * kd, hp.mtl.base_color[:, 1] * kd,
               hp.mtl.base_color[:, 2] * kd,
               # 33-35: WORLD wo — the kernel's 5th MXU row block
               # (wo_l . wi_l == wo_world . ewi); 36: alpha^2
               hp.wo[:, 0], hp.wo[:, 1], hp.wo[:, 2], alpha * alpha]
    sperm = jnp.argsort(hkey).astype(jnp.int32)
    shkey = hkey[sperm]
    hp_mat = jnp.stack(hp_cols, axis=1)[sperm]             # (B, 33)
    Bp = ((B + HP_CHUNK - 1) // HP_CHUNK + 1) * HP_CHUNK
    # last dim padded to a full 128-lane tile: Mosaic requires DMA slices
    # to cover whole lane tiles
    hp_tab = jnp.concatenate(
        [_pad_to(hp_mat, Bp),
         jnp.zeros((Bp, 128 - hp_mat.shape[1]), jnp.float32)], axis=1)

    # ---- per-cell meta: hitpoint ranges + 9 event windows --------------
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), shkey[:-1]])
    starts = (shkey != prev) & (shkey < BIG)
    rank = jnp.cumsum(starts.astype(jnp.int32)) - 1
    n_valid_hp = jnp.sum((shkey < BIG).astype(jnp.int32))
    slot = jnp.where(starts & (rank <= cmax), rank, cmax + 1)
    key_cell = jnp.full((cmax + 2,), BIG, jnp.int32).at[slot].set(shkey)
    hp_start = jnp.zeros((cmax + 2,), jnp.int32).at[slot].set(
        jnp.arange(B, dtype=jnp.int32))
    n_cells = jnp.sum(starts.astype(jnp.int32))
    hp_start = hp_start.at[jnp.minimum(n_cells, cmax)].set(
        jnp.where(n_cells <= cmax, n_valid_hp, hp_start[cmax]))
    counts = hp_start[1:cmax + 1] - hp_start[:cmax]
    live = (jnp.arange(cmax) < jnp.minimum(n_cells, cmax)) \
        & (key_cell[:cmax] < BIG)
    counts = jnp.where(live, counts, 0)

    offs = jnp.asarray(OFFS, jnp.int32)
    qlo = key_cell[:cmax, None] + offs[None, :] - DZ_LO   # (cmax, 9)
    # windows are 128-aligned anyway, so search the 64x smaller array of
    # per-block first keys instead of all E keys (the binary search's
    # random probes were a measurable slice of the pass)
    bkeys = skey_p[::128]                                 # (Ep/128,)
    # side="left" - 1: a run of keys == qlo can span backward into the
    # previous block (whose first key is < qlo)
    astart = jnp.maximum(
        jnp.searchsorted(bkeys, qlo.ravel(),
                         side="left").astype(jnp.int32) - 1, 0)
    bend = jnp.searchsorted(bkeys, (qlo + DZ_LO + DZ_HI).ravel(),
                            side="right").astype(jnp.int32)
    astart = astart.reshape(cmax, 9)
    asize = jnp.maximum(bend.reshape(cmax, 9) - astart, 0) * 128
    # meta row: [hp_start, hp_count, astart x9, asize x9, qlo x9, pad x3]
    meta = jnp.concatenate(
        [hp_start[:cmax, None], counts[:, None], astart, asize,
         qlo, jnp.zeros((cmax, 3), jnp.int32)],
        axis=1).reshape(cmax, 1, 32)

    # cells per grid step (PT_TPU_PPM_CPG): amortizes the ~25 us fixed
    # per-step cost over several cells; cmax is a multiple of any
    # power-of-two cpg <= 16
    import functools

    # DEFAULT 1 (round-4 hardware A/B, /tmp/hw_measure/r4_ppm_knobs.jsonl):
    # the round-3 snapshot shipped cpg=8 untested and it REGRESSED the
    # 1M-photon pass 1.446 -> 1.009 Mphotons/s — batching cells into one
    # grid step doubles the PAIR-math bucket (skeleton unchanged at
    # ~0.476 s), i.e. the bigger kernel body defeats Mosaic's pipelining
    # exactly like the round-3 dynamic block loop did
    cpg = int(os.environ.get("PT_TPU_PPM_CPG", "1"))
    cpg = max(1, min(cpg, 16))
    while cmax % cpg:
        cpg //= 2
    if os.environ.get("PT_TPU_PPM_NEUTER") == "kernel":
        # timing bisect ONLY (flux is wrong): run ALL the XLA prep (event
        # sort/pack, hitpoint pack, per-cell meta) but skip the pallas
        # join — paired with the 'gather' neuter (which skips prep too)
        # this isolates the sort/pack bucket, the largest remaining
        # config4 term after the round-4 hp-outer default (r4-s3: full
        # 0.613 s/M, window machinery 0.065, pairs 0.205, trace 0.104)
        anchor = (jnp.sum(ev_tab) + jnp.sum(hp_tab)
                  + jnp.sum(meta).astype(jnp.float32)) * 0.0
        anchor = jnp.where(jnp.isnan(anchor), 0.0, anchor)
        out = jnp.zeros((Bp, 128), jnp.float32) + anchor
    else:
        out = pl.pallas_call(
            functools.partial(_gather_kernel, cpg=cpg, ev_chunk=ev_chunk),
            grid=(cmax // cpg,),
            in_specs=[
                pl.BlockSpec((cpg, 1, 32), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((HP_CHUNK, 128), jnp.float32),
                # 10 event slots: one per eagerly-prefetched neighbor
                # window (0..8) + one synchronous slot (9) for the rare
                # multi-chunk drains
                pltpu.VMEM((10, ev_chunk // 128, EV_ROWS, 128),
                           jnp.float32),
                pltpu.VMEM((HP_CHUNK, 128), jnp.float32),
                pltpu.VMEM((4, HP_CHUNK, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((12,)),
            ],
            interpret=interpret,
        )(meta, r2.reshape(1, 1), hp_tab, ev_tab)

    covered = (rank < cmax) & (shkey < BIG)               # sorted order
    flux_s = jnp.where(covered[:, None], out[:B, 0:3], 0.0)
    count_s = jnp.where(covered, out[:B, 3], 0.0)
    flux = jnp.zeros((B, 3)).at[sperm].set(flux_s)
    count = jnp.zeros((B,)).at[sperm].set(count_s).astype(jnp.int32)
    overflow = n_valid_hp - jnp.sum(counts) + ev_dropped
    return flux, count, overflow
