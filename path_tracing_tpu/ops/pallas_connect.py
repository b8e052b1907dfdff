"""Fused Pallas kernel for BDPT eye-light connections.

The chunked XLA connection sweep (integrators/bdpt._connect) materializes
~15 ``(B, C)`` intermediates per chunk in HBM.  This kernel holds the whole
compacted light-vertex set as a small VMEM table and loops it per ray tile —
exactly like the primitive sweeps — so each connection's geometry, both BSDF
eval/pdf pairs, the inline shadow sweep and the O(1) MIS all stay in
registers.  Output: the per-lane contribution sum (B, 3).

Vertex table rows (see ``pack_light_vertices``):
  [pos3, normal3, tp3, bc3, rough, metal, eta, is_src, cutoff, is_par,
   emit_dir3, wo3, mis_a, valid, tangent3, bitangent3, wo_local3,
   alpha, cos_cutoff]  (37 used, padded to 40) — the per-vertex shading
  frame, local outgoing direction, GGX alpha and cone cosine are hoisted
  to pack time (XLA), so the kernel's per-(vertex, tile) body skips
  ~40 broadcast ops of frame building per vertex.

Semantics identical to bdpt._connect (bdpt_cu.cu:384-457 / cpu_bdpt.cpp:
389-439 with the linear-prefactor MIS); equivalence is tested against the
XLA path.
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
from .pallas_intersect import (LANE, TILE_ROWS, _ray_specs, _tile,
                               interp_forced, pack_scene, super_table)
from .pallas_shade import (Mtl, V3, build_frame, clamp3, dot3, eval_local,
                           half_vector, pdf_local, roughness_to_alpha,
                           shadow_blocked, to_local, valid3, where3)

PDF_OMEGA_FLOOR = 1e-6


def pack_light_vertices(lv_flat) -> jnp.ndarray:
    """Flat LightVertices -> (V, 40) f32 VMEM table (column layout above)."""
    from ..ops.frame import build_local_frame, world_to_local
    from ..ops.microfacet import roughness_to_alpha as r2a

    V = lv_flat.pos.shape[0]
    lt, lb = build_local_frame(lv_flat.normal)
    wo_t_l = world_to_local(lv_flat.wo, lt, lb, lv_flat.normal)
    cols = [
        lv_flat.pos, lv_flat.normal, lv_flat.throughput,
        lv_flat.mtl.base_color,
        lv_flat.mtl.roughness[:, None], lv_flat.mtl.metallic[:, None],
        lv_flat.mtl.eta[:, None],
        lv_flat.is_light_source.astype(jnp.float32)[:, None],
        lv_flat.source_cutoff[:, None],
        lv_flat.is_parallel.astype(jnp.float32)[:, None],
        lv_flat.emit_dir, lv_flat.wo,
        lv_flat.mis_a[:, None],
        lv_flat.valid.astype(jnp.float32)[:, None],
        lt, lb, wo_t_l,
        r2a(lv_flat.mtl.roughness)[:, None],
        jnp.cos(lv_flat.source_cutoff)[:, None],
    ]
    tab = jnp.concatenate(cols, axis=1)                      # (V, 37)
    pad_cols = 40 - tab.shape[1]
    tab = jnp.concatenate([tab, jnp.zeros((V, pad_cols))], axis=1)
    pad_rows = (-V) % 8
    return jnp.concatenate([tab, jnp.zeros((pad_rows, 40))], axis=0)


def connect_core(sph_ref, tri_ref, cl_ref, sup_ref, lv_ref, n_valid,
                 ev_pos: V3, ev_n: V3, ev_tp: V3, m_e: Mtl, wo_e: V3,
                 wo_s: V3, eye_f, act,
                 *, ns, nl, nt, clamp_val, blocks_col,
                 use_super=False) -> V3:
    """Sum of all light-vertex connection contributions for one eye vertex
    per lane, entirely in registers.  Shared by the standalone connection
    kernel and the BDPT eye megakernel (ops/pallas_bdpt_eye.py)."""
    # PT_TPU_BDPT_NEUTER (trace-time, BISECT ONLY — renders are wrong):
    # 'connect' skips the whole vertex sweep, 'shadow' skips the
    # visibility sweeps, 'eval' skips the BSDF/MIS math (gates + shadow
    # kept).  Used by tools/hw_sweep.py to attribute config5's cycles.
    neuter = os.environ.get("PT_TPU_BDPT_NEUTER", "")
    zero = jnp.zeros_like(eye_f)
    if neuter == "connect":
        return V3(zero, zero, zero)
    # hoisted eye-side frame
    et, eb = build_frame(ev_n)
    wo_e_l = to_local(wo_e, et, eb, ev_n)
    wo_s_l = to_local(wo_s, et, eb, ev_n)
    alpha_e = roughness_to_alpha(m_e.rough)

    # vertex-table accessor: (V, 40) shared table, or a (1, Kp, 40)
    # per-tile block (tile-local RIS — ops/pallas_bdpt_eye.py)
    if len(lv_ref.shape) == 3:
        def lv(c, col):
            return lv_ref[0, c, col]
    else:
        def lv(c, col):
            return lv_ref[c, col]

    def body(c, acc):
        lp = V3(lv(c, 0), lv(c, 1), lv(c, 2))
        ln = V3(lv(c, 3), lv(c, 4), lv(c, 5))
        ltp = V3(lv(c, 6), lv(c, 7), lv(c, 8))
        m_l = Mtl(V3(lv(c, 9), lv(c, 10), lv(c, 11)),
                  lv(c, 12), lv(c, 13), lv(c, 14))
        is_src = lv(c, 15) > 0.0
        cutoff = lv(c, 16)
        is_par = lv(c, 17) > 0.0
        emit = V3(lv(c, 18), lv(c, 19), lv(c, 20))
        mis_a = lv(c, 24)
        v_ok = lv(c, 25) > 0.0
        # pack-time hoisted per-vertex shading frame (cols 26-36)
        lt = V3(lv(c, 26), lv(c, 27), lv(c, 28))
        lb = V3(lv(c, 29), lv(c, 30), lv(c, 31))
        wo_t_l = V3(lv(c, 32), lv(c, 33), lv(c, 34))
        alpha_l = lv(c, 35)
        cos_cut = lv(c, 36)

        d_vec = lp - ev_pos
        dist2 = dot3(d_vec, d_vec)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        wi = d_vec.scale(1.0 / dist)

        cos_e = jnp.maximum(0.0, dot3(ev_n, wi))
        cos_l = jnp.maximum(0.0, dot3(-ln, wi))
        gate = act & v_ok & (dist2 >= 1e-6) & (cos_e > 0.0) & (cos_l > 0.0)
        cone_bad = (is_src & (cutoff > 0.0) & ~is_par
                    & (dot3(emit, -wi) < cos_cut))
        gate &= ~cone_bad

        if neuter == "eval":
            # bisect: geometry gates + shadow only; contribution = gate
            def run_shadow_n(_):
                return shadow_blocked(
                    sph_ref, tri_ref, cl_ref, sup_ref,
                    ev_pos + ev_n.scale(EPSILON), lp + ln.scale(EPSILON),
                    ns=ns, nl=nl, nt=nt, blocks_col=blocks_col,
                    use_super=use_super).astype(jnp.int32)

            blk = jax.lax.cond(jnp.any(gate), run_shadow_n,
                               lambda _: jnp.ones_like(zero, jnp.int32), 0)
            v = jnp.where(gate & (blk == 0), 1e-6, 0.0)
            return acc + V3(v, v, v)

        # eye side: eval with wo_e, pdf with wo_s (hoisted frame).  MIS-pdf
        # quirk: the reference feeds the UNNORMALIZED d_vec into bsdf_pdf
        # (bdpt_cu.cu:443-449; bsdf_pdf never normalizes) — the pdf wi is
        # dist-scaled, the eval wi stays unit (bdpt_cu.cu:423,430)
        wi_e_l = to_local(wi, et, eb, ev_n)
        wh_e, ok_e = half_vector(wo_e_l, wi_e_l)
        f_e = eval_local(m_e, wo_e_l, wi_e_l, alpha_e, wh_e, ok_e)
        wi_s_l = wi_e_l.scale(dist)
        wh_s, ok_s = half_vector(wo_s_l, wi_s_l)
        pdf_s = jnp.maximum(
            pdf_local(m_e, wo_s_l, wi_s_l, alpha_e, wh_s, ok_s),
            PDF_OMEGA_FLOOR)

        # light side: the per-vertex frame / local wo / alpha come hoisted
        # from the table (pack-time XLA — identical math to the in-kernel
        # build_frame, so equivalence vs the XLA sweep is unchanged)
        wi_l_l = to_local(-wi, lt, lb, ln)
        wh_l, ok_l = half_vector(wo_t_l, wi_l_l)
        one = jnp.ones_like(zero)
        # DEFAULT 1 (round-4 A/B: 2.908 vs 2.894 Mpaths/s at config5 —
        # a strict work skip, within session noise but never worse).
        # PT_TPU_C5_SRC_SKIP=0 reverts to the unconditional eval.
        if os.environ.get("PT_TPU_C5_SRC_SKIP", "1") == "1":
            # is_src is a per-vertex SCALAR: a lax.cond skips the whole
            # light-side eval for emitter vertices instead of computing
            # and discarding it (round-4 A/B; identical results — the
            # where3 already discarded the eval on source vertices)
            f_l = jax.lax.cond(
                is_src,
                lambda _: V3(one, one, one),
                lambda _: eval_local(m_l, wo_t_l, wi_l_l, alpha_l, wh_l,
                                     ok_l), 0)
        else:
            f_l = where3(is_src, V3(one, one, one),
                         eval_local(m_l, wo_t_l, wi_l_l, alpha_l, wh_l,
                                    ok_l))
        wi_t_l = wi_l_l.scale(dist)
        wh_t, ok_t = half_vector(wo_t_l, wi_t_l)
        pdf_t = jnp.maximum(
            pdf_local(m_l, wo_t_l, wi_t_l, alpha_l, wh_t, ok_t),
            PDF_OMEGA_FLOOR)
        gate &= ((f_e.x > 0.0) | (f_e.y > 0.0) | (f_e.z > 0.0))
        gate &= ((f_l.x > 0.0) | (f_l.y > 0.0) | (f_l.z > 0.0))

        # the shadow sweep is ~60% of the body — skip it whenever NO lane in
        # the tile still has a live gate for this vertex (delta-chain-only
        # iterations, behind-cone vertices, fully back-facing tiles...)
        def run_shadow(_):
            return shadow_blocked(
                sph_ref, tri_ref, cl_ref, sup_ref,
                ev_pos + ev_n.scale(EPSILON), lp + ln.scale(EPSILON),
                ns=ns, nl=nl, nt=nt, blocks_col=blocks_col,
                use_super=use_super).astype(jnp.int32)

        if neuter == "shadow":
            blocked = jnp.zeros_like(zero, jnp.int32)  # bisect: all visible
        else:
            blocked = jax.lax.cond(jnp.any(gate), run_shadow,
                                   lambda _: jnp.ones_like(zero, jnp.int32),
                                   0)
        tr = jnp.where(blocked != 0, 0.0, 1.0)
        gate &= tr > 0.0

        g_term = cos_e * cos_l / jnp.maximum(dist2, 1e-4)
        # dist-scaled cosines: the reference's dot(n, d_vec) forms
        pdf_s_to_t = pdf_s * cos_l * dist / jnp.maximum(dist2, 1e-20)
        pdf_t_to_s = pdf_t * cos_e * dist / jnp.maximum(dist2, 1e-20)
        sum_ratios = 1.0 + pdf_t_to_s * eye_f + pdf_s_to_t * mis_a
        mis_ok = jnp.isfinite(sum_ratios) & (sum_ratios > 0.0)
        mis_w = jnp.where(mis_ok, 1.0 / jnp.maximum(sum_ratios, 1e-30), 0.0)

        contrib = ev_tp.mul(f_e).mul(f_l).mul(ltp).scale(
            g_term * tr * mis_w)
        ok = gate & valid3(contrib)
        contrib = where3(ok, clamp3(contrib, clamp_val),
                         V3(zero, zero, zero))
        return acc + contrib

    def run_loop(_):
        return jax.lax.fori_loop(0, n_valid, body, V3(zero, zero, zero))

    # skip the whole sweep when the tile has no active eye vertex at all
    return jax.lax.cond(jnp.any(act), run_loop,
                        lambda _: V3(zero, zero, zero), 0)


def _connect_kernel(sph_ref, tri_ref, cl_ref, sup_ref, lv_ref, nvalid_ref,
                    epx, epy, epz, enx, eny, enz,
                    etx, ety, etz, bcr, bcg, bcb, rough, metal, meta,
                    woex, woey, woez, wosx, wosy, wosz, eyef, act_in,
                    out_x, out_y, out_z,
                    *, ns, nl, nt, clamp_val, blocks_col, use_super):
    acc = connect_core(
        sph_ref, tri_ref, cl_ref, sup_ref, lv_ref, nvalid_ref[0, 0],
        V3(epx[...], epy[...], epz[...]),
        V3(enx[...], eny[...], enz[...]),
        V3(etx[...], ety[...], etz[...]),
        Mtl(V3(bcr[...], bcg[...], bcb[...]), rough[...], metal[...],
            meta[...]),
        V3(woex[...], woey[...], woez[...]),
        V3(wosx[...], wosy[...], wosz[...]),
        eyef[...], act_in[...] != 0,
        ns=ns, nl=nl, nt=nt, clamp_val=clamp_val, blocks_col=blocks_col,
        use_super=use_super)
    out_x[...] = acc.x
    out_y[...] = acc.y
    out_z[...] = acc.z


def connect_pallas(scene: Scene, lv_tab: jnp.ndarray, n_valid,
                   ev_pos, ev_normal, ev_tp, ev_mtl, wo_e, wo_s, eye_f, act,
                   *, clamp_val, dielectrics_block):
    """Sum of connection contributions per eye lane, (B, 3)."""
    B = ev_pos.shape[0]
    sph_tab, tri_tab, cl_tab, ns, nl, nt = pack_scene(scene)
    cl_tab, sup_tab, use_super = super_table(cl_tab)

    comps = [ev_pos[:, 0], ev_pos[:, 1], ev_pos[:, 2],
             ev_normal[:, 0], ev_normal[:, 1], ev_normal[:, 2],
             ev_tp[:, 0], ev_tp[:, 1], ev_tp[:, 2],
             ev_mtl.base_color[:, 0], ev_mtl.base_color[:, 1],
             ev_mtl.base_color[:, 2], ev_mtl.roughness, ev_mtl.metallic,
             ev_mtl.eta,
             wo_e[:, 0], wo_e[:, 1], wo_e[:, 2],
             wo_s[:, 0], wo_s[:, 1], wo_s[:, 2],
             eye_f, act.astype(jnp.int32)]
    tiled = [_tile(c, TILE_ROWS)[0] for c in comps]
    rows_total = tiled[0].shape[0]
    grid = rows_total // TILE_ROWS

    kernel = functools.partial(
        _connect_kernel, ns=ns, nl=nl, nt=nt, clamp_val=clamp_val,
        blocks_col=4 if dielectrics_block else 5, use_super=use_super)
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
            pl.BlockSpec(lv_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            *_ray_specs(len(comps)),
        ],
        out_specs=[pl.BlockSpec((TILE_ROWS, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM) for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((rows_total, LANE), jnp.float32)
                   for _ in range(3)],
        interpret=interp_forced(),
    )(sph_tab, tri_tab, cl_tab, sup_tab, lv_tab,
      jnp.asarray(n_valid, jnp.int32).reshape(1, 1), *tiled)
    return jnp.stack([o.reshape(-1)[:B] for o in outs], axis=-1)
