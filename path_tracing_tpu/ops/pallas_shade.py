"""Fused Pallas "shade" kernel for the PT wavefront.

One bounce of the PT integrator after the nearest-hit kernel costs ~30
XLA ops over (B,)/(B,3) arrays — every one a round trip through HBM.  This
kernel fuses the whole shade stage into a single VMEM-resident pass per ray
tile:

  emission matching (pt_cu.cu:59-121) -> NEE with the shadow-ray loop
  inlined over the VMEM scene tables (pt_cu.cu:125-201) -> BSDF sample
  (geometric.cuh:486-562) -> ray/throughput/depth state update.

Uniform random numbers are fed IN (drawn with jax.random outside) so the
sample streams match the XLA path bit-for-bit, keeping renders reproducible
and the two backends directly comparable (PT_TPU_NO_PALLAS A/B).

Everything is written component-wise: a 3-vector is three (rows, 128) f32
planes (the `V3` helper), matching the TPU's lane layout.  The math mirrors
ops/bsdf.py / ops/fresnel.py / ops/microfacet.py exactly — including the
reference's non-normalized GGX D quirk — and is validated against the XLA
path by tests/test_pallas.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import Scene
from .math3 import EPSILON, PI
from .pallas_intersect import (LANE, TILE_ROWS, _ray_specs, _tile,
                               interp_forced, mega_rows, pack_scene,
                               super_table, tile_rows)

INF = 1e20


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(s, o):
        return V3(s.x + o.x, s.y + o.y, s.z + o.z)

    def __sub__(s, o):
        return V3(s.x - o.x, s.y - o.y, s.z - o.z)

    def __neg__(s):
        return V3(-s.x, -s.y, -s.z)

    def scale(s, k):
        return V3(s.x * k, s.y * k, s.z * k)

    def mul(s, o):
        return V3(s.x * o.x, s.y * o.y, s.z * o.z)


def dot3(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross3(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def norm3(a: V3):
    return jnp.sqrt(dot3(a, a))


def normalize3(a: V3, eps=1e-20) -> V3:
    inv = 1.0 / jnp.maximum(norm3(a), eps)
    return a.scale(inv)


def where3(m, a: V3, b: V3) -> V3:
    return V3(jnp.where(m, a.x, b.x), jnp.where(m, a.y, b.y),
              jnp.where(m, a.z, b.z))


def valid3(c: V3):
    bad = (jnp.isnan(c.x) | jnp.isnan(c.y) | jnp.isnan(c.z)
           | jnp.isinf(c.x) | jnp.isinf(c.y) | jnp.isinf(c.z)
           | (c.x < 0.0) | (c.y < 0.0) | (c.z < 0.0))
    return ~bad


def clamp3(c: V3, mx: float) -> V3:
    m = jnp.maximum(c.x, jnp.maximum(c.y, c.z))
    s = jnp.where(m > mx, mx / m, 1.0)
    return c.scale(s)


# ---------------------------------------------------------------------------
# local frames + microfacet math (component-wise ports of ops/*)
# ---------------------------------------------------------------------------

def build_frame(n: V3):
    """geometric.cuh:119-123"""
    use_z = jnp.abs(n.z) < 0.999
    ax = where3(use_z, V3(*(jnp.zeros_like(n.x),) * 2, jnp.ones_like(n.x)),
                V3(jnp.zeros_like(n.x), jnp.ones_like(n.x),
                   jnp.zeros_like(n.x)))
    t = normalize3(cross3(ax, n))
    b = cross3(n, t)
    return t, b


def to_local(v: V3, t: V3, b: V3, n: V3) -> V3:
    return V3(dot3(v, t), dot3(v, b), dot3(v, n))


def to_world(v: V3, t: V3, b: V3, n: V3) -> V3:
    return V3(t.x * v.x + b.x * v.y + n.x * v.z,
              t.y * v.x + b.y * v.y + n.y * v.z,
              t.z * v.x + b.z * v.y + n.z * v.z)


def fr_dielectric(cos_i, eta_i, eta_t):
    """geometric.cuh:145-160 (incl. the eta=0 -> TIR/NaN edge semantics)."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    cos_i = jnp.abs(cos_i)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_par = ((et * cos_i) - (ei * cos_t)) / ((et * cos_i) + (ei * cos_t))
    r_per = ((ei * cos_i) - (et * cos_t)) / ((ei * cos_i) + (et * cos_t))
    return jnp.where(tir, 1.0, (r_par * r_par + r_per * r_per) / 2.0)


def fr_schlick(cos_i, r0: V3) -> V3:
    c = jnp.maximum(0.0, 1.0 - cos_i)
    c5 = c * c * c * c * c
    one = jnp.ones_like(cos_i)
    return V3(r0.x + (one - r0.x) * c5, r0.y + (one - r0.y) * c5,
              r0.z + (one - r0.z) * c5)


def tan2_theta(w: V3):
    c2 = w.z * w.z
    s2 = jnp.maximum(0.0, 1.0 - c2)
    return s2 / (c2 + 1e-7)


def tr_d(wh: V3, alpha):
    """Reference's non-normalized D (alpha^2 + tan^4), geometric.cuh:178-185."""
    t2 = tan2_theta(wh)
    cos4 = (wh.z * wh.z) * (wh.z * wh.z)
    e = cos4 * (alpha * alpha + t2 * t2)
    d = (alpha * alpha) / (PI * e)
    return jnp.where(jnp.isinf(t2) | (e < 1e-12), 0.0, d)


def tr_lambda(w: V3, alpha):
    c2 = w.z * w.z
    s2 = jnp.maximum(0.0, 1.0 - c2)
    abs_tan = jnp.abs(jnp.sqrt(s2) / (w.z + 1e-7))
    a2t2 = (alpha * abs_tan) * (alpha * abs_tan)
    return jnp.where(jnp.isinf(abs_tan), 0.0,
                     (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0)


def roughness_to_alpha(r):
    x = jnp.maximum(r, 1e-3)
    return x * x


class Mtl(NamedTuple):
    bc: V3
    rough: jnp.ndarray
    metal: jnp.ndarray
    eta: jnp.ndarray


def half_vector(wo: V3, wi: V3):
    wh = wo + wi
    ln = norm3(wh)
    wh = wh.scale(1.0 / jnp.maximum(ln, 1e-20))
    wh = where3(wh.z < 0.0, -wh, wh)
    return wh, ln >= 1e-6


def eval_local(m: Mtl, wo: V3, wi: V3, alpha, wh: V3, wh_ok) -> V3:
    """geometric.cuh:419-456 component-wise."""
    zero_cos = (wo.z == 0.0) | (wi.z == 0.0)
    smooth_diel = (m.eta > 0.0) & (m.rough < 0.001)

    same = wo.z * wi.z > 0.0
    kd = (1.0 - m.metal) / PI
    diffuse = V3(m.bc.x * kd, m.bc.y * kd, m.bc.z * kd)
    diffuse = where3(wo.z * wi.z < 0.0,
                     V3(*(jnp.zeros_like(kd),) * 3), diffuse)

    d = tr_d(wh, alpha)
    g = 1.0 / (1.0 + tr_lambda(wo, alpha) + tr_lambda(wi, alpha))
    fs = fr_schlick(jnp.abs(wo.z), m.bc)
    fr = fr_dielectric(dot3(wo, wh), jnp.ones_like(m.eta), m.eta)
    f = where3(m.metal > 0.0, fs, V3(fr, fr, fr))
    denom = jnp.maximum(4.0 * jnp.abs(wo.z) * jnp.abs(wi.z), 1e-4)
    spec = f.scale(d * g / denom)

    out = where3(same, diffuse + spec, diffuse)
    kill = zero_cos | smooth_diel | ~wh_ok
    return where3(kill, V3(*(jnp.zeros_like(d),) * 3), out)


def pdf_local(m: Mtl, wo: V3, wi: V3, alpha, wh: V3, wh_ok):
    """geometric.cuh:458-484 component-wise."""
    opposite = wo.z * wi.z <= 0.0
    smooth_diel = (m.eta > 0.0) & (m.rough < 0.001)
    pdf_diff = jnp.abs(wi.z) / PI
    g1 = 1.0 / (1.0 + tr_lambda(wo, alpha))
    dwh = dot3(wo, wh)
    pdf_wh = tr_d(wh, alpha) * g1 * jnp.maximum(0.0, dwh) / jnp.maximum(
        jnp.abs(wo.z), 1e-20)
    pdf_spec = pdf_wh / (4.0 * dwh + 1e-7)
    sw = jnp.where(m.metal > 0.0, 1.0, 0.5)
    pdf = (1.0 - sw) * pdf_diff + sw * pdf_spec
    return jnp.where(opposite | smooth_diel | ~wh_ok, 0.0, pdf)


def sample_vndf(wo: V3, alpha, u1, u2) -> V3:
    """geometric.cuh:200-221 component-wise; wo must be upper hemisphere."""
    v = normalize3(V3(alpha * wo.x, alpha * wo.y, wo.z))
    use_cross = v.z < 0.9999
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    cz = cross3(V3(zero, zero, one), v)
    cz = cz.scale(1.0 / jnp.maximum(norm3(cz), 1e-20))
    t1 = where3(use_cross, cz, V3(one, zero, zero))
    t2 = cross3(v, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v.z)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    nh = (t1.scale(p1) + t2.scale(p2)
          + v.scale(jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))))
    return normalize3(V3(alpha * nh.x, alpha * nh.y,
                         jnp.maximum(0.0, nh.z)))


def bsdf_sample_k(m: Mtl, wo_w: V3, n: V3, u_rr, u1, u2, cur_eta):
    """geometric.cuh:486-562 component-wise (mask-selected branches)."""
    t, b = build_frame(n)
    wo = to_local(wo_w, t, b, n)

    m_diel = (m.eta > 0.0) & (m.rough < 0.001) & (m.metal < 0.01)
    m_cond = ~m_diel & (m.metal > 0.99) & (m.rough < 0.001)
    is_delta = m_diel | m_cond

    # smooth dielectric
    f = fr_dielectric(wo.z, cur_eta, m.eta)
    refl = V3(-wo.x, -wo.y, wo.z)
    entering = wo.z > 0.0
    eta_ratio = jnp.where(entering, cur_eta / m.eta, m.eta / cur_eta)
    sin2_i = jnp.maximum(0.0, 1.0 - wo.z * wo.z)
    sin2_t = eta_ratio * eta_ratio * sin2_i
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    cos_t = jnp.where(entering, -cos_t, cos_t)
    refr = V3(-eta_ratio * wo.x, -eta_ratio * wo.y, cos_t)
    take_refl = u_rr < f
    d_wi = where3(take_refl, refl, refr)
    d_cos = jnp.maximum(jnp.abs(d_wi.z), 1e-20)
    d_pdf = jnp.where(take_refl, f, 1.0 - f)
    one = jnp.ones_like(f)
    d_val = where3(take_refl, V3(f / d_cos, f / d_cos, f / d_cos),
                   m.bc.scale((1.0 - f) / d_cos))
    dead_refr = ~take_refl & tir
    d_pdf = jnp.where(dead_refr, 0.0, d_pdf)
    d_val = where3(dead_refr, V3(*(jnp.zeros_like(f),) * 3), d_val)
    d_eta = jnp.where(take_refl, cur_eta, jnp.where(entering, m.eta, one))

    # smooth conductor
    c_val = fr_schlick(jnp.abs(wo.z), m.bc).scale(
        1.0 / jnp.maximum(jnp.abs(refl.z), 1e-20))

    # rough
    alpha = roughness_to_alpha(m.rough)
    sw = jnp.where(m.metal > 0.0, 1.0, 0.5)
    wo_up = where3(wo.z > 0.0, wo, -wo)
    wh = sample_vndf(wo_up, alpha, u1, u2)
    wh = where3(wo.z < 0.0, -wh, wh)
    spec_wi = (-wo) - wh.scale(2.0 * dot3(wh, -wo))
    spec_bad = wo.z * spec_wi.z <= 0.0
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    diff_wi = V3(r * jnp.cos(phi), r * jnp.sin(phi),
                 jnp.sqrt(jnp.maximum(0.0, 1.0 - u1)))
    diff_wi = where3(wo.z < 0.0, V3(diff_wi.x, diff_wi.y, -diff_wi.z),
                     diff_wi)
    take_spec = u_rr < sw
    r_wi = where3(take_spec, spec_wi, diff_wi)
    r_dead = take_spec & spec_bad
    wh_r, wh_ok = half_vector(wo, r_wi)
    r_pdf = jnp.where(r_dead, 0.0,
                      pdf_local(m, wo, r_wi, alpha, wh_r, wh_ok))
    r_val = where3(r_dead, V3(*(jnp.zeros_like(f),) * 3),
                   eval_local(m, wo, r_wi, alpha, wh_r, wh_ok))

    wi_l = where3(m_diel, d_wi, where3(m_cond, refl, r_wi))
    wi_w = to_world(wi_l, t, b, n)
    val = where3(m_diel, d_val, where3(m_cond, c_val, r_val))
    pdf = jnp.where(m_diel, d_pdf, jnp.where(m_cond, one, r_pdf))
    new_eta = jnp.where(m_diel, d_eta, cur_eta)
    return wi_w, val, pdf, is_delta, new_eta


def eval_pdf_world(m: Mtl, wo_w: V3, wi_w: V3, n: V3):
    t, b = build_frame(n)
    wo = to_local(wo_w, t, b, n)
    wi = to_local(wi_w, t, b, n)
    alpha = roughness_to_alpha(m.rough)
    wh, ok = half_vector(wo, wi)
    return (eval_local(m, wo, wi, alpha, wh, ok),
            pdf_local(m, wo, wi, alpha, wh, ok))


# ---------------------------------------------------------------------------
# in-kernel shadow loop (the blocker sweep, cluster-culled)
# ---------------------------------------------------------------------------

def _inline_sub_rows(rows: int, n_clusters: int) -> int:
    """Sub-tile height for the in-kernel cluster walks: mesh scenes
    (cluster count >= 16) re-test the slab cull per window so only windows
    that can still be improved/blocked sweep a cluster's triangles; tiny
    scenes keep the whole-tile walk (the per-window loop overhead buys
    nothing with one all-covering cluster)."""
    from .pallas_intersect import sub_rows

    return sub_rows(rows) if n_clusters >= 16 else rows


def shadow_blocked(sph_ref, tri_ref, cl_ref, sup_ref, p1: V3, p2: V3, *,
                   ns, nl, nt, blocks_col, use_super=False):
    """check_visibility semantics (geometric.cuh:293-325) on VMEM tables.
    The cluster walk runs per sub-tile for mesh scenes (see
    ``_inline_sub_rows``) and descends octant-ordered supers when the
    cluster table is large (same 2-level machinery as the standalone
    ``_blocker_kernel``)."""
    from .pallas_intersect import SUPER, _octant_perm, _tile_octant
    diff = p2 - p1
    dist = norm3(diff)
    rd = diff.scale(1.0 / jnp.maximum(dist, 1e-20))
    md = dist - 1e-3
    MIN_D = 1e-3
    blocked = jnp.zeros_like(dist, jnp.int32)

    def sph_body(i, blocked):
        c = V3(sph_ref[i, 0], sph_ref[i, 1], sph_ref[i, 2])
        rr = sph_ref[i, 3]
        can = sph_ref[i, blocks_col]
        oc = p1 - c
        b = dot3(oc, rd)
        cq = dot3(oc, oc) - rr * rr
        h = b * b - cq
        sh = jnp.sqrt(jnp.maximum(h, 0.0))
        ok = (h >= 0.0) & (rr > 0.0) & (can > 0.0)
        t1 = -b - sh
        t2 = -b + sh
        v1 = ok & (t1 > EPSILON) & (t1 < md)
        v2 = ok & (t2 > EPSILON) & (t2 < md)
        t = jnp.where(v1, t1, jnp.where(v2, t2, INF))
        return blocked | ((t < INF) & (t > MIN_D)).astype(jnp.int32)

    # light-ball rows (ns..ns+nl) carry hard-zero block flags — skip them
    blocked = jax.lax.fori_loop(0, ns, sph_body, blocked)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                               jnp.where(d >= 0.0, 1e-12, -1e-12), d)

    def walk(blocked, wp1, wrd, wmd):
        inv = V3(safe_inv(wrd.x), safe_inv(wrd.y), safe_inv(wrd.z))

        def tri_body(i, blocked):
            v0 = V3(tri_ref[i, 0], tri_ref[i, 1], tri_ref[i, 2])
            e1 = V3(tri_ref[i, 3] - v0.x, tri_ref[i, 4] - v0.y,
                    tri_ref[i, 5] - v0.z)
            e2 = V3(tri_ref[i, 6] - v0.x, tri_ref[i, 7] - v0.y,
                    tri_ref[i, 8] - v0.z)
            can = tri_ref[i, blocks_col + 5]
            h = cross3(wrd, e2)
            a = dot3(e1, h)
            parallel = (a > -1e-6) & (a < 1e-6)
            fi = 1.0 / jnp.where(parallel, 1.0, a)
            s = wp1 - v0
            u = fi * dot3(s, h)
            q = cross3(s, e1)
            v = fi * dot3(wrd, q)
            t = fi * dot3(e2, q)
            ok = (~parallel & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (t > EPSILON) & (t < wmd)
                  & (can > 0.0))
            return blocked | (ok & (t > MIN_D)).astype(jnp.int32)

        def cluster_body(c, blocked):
            t0x = (cl_ref[c, 0] - wp1.x) * inv.x
            t1x = (cl_ref[c, 3] - wp1.x) * inv.x
            t0y = (cl_ref[c, 1] - wp1.y) * inv.y
            t1y = (cl_ref[c, 4] - wp1.y) * inv.y
            t0z = (cl_ref[c, 2] - wp1.z) * inv.z
            t1z = (cl_ref[c, 5] - wp1.z) * inv.z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), MIN_D))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            could = (tn <= tf) & (tn < wmd) & (blocked == 0)
            start = cl_ref[c, 6].astype(jnp.int32)
            count = cl_ref[c, 7].astype(jnp.int32)

            def run(blocked):
                return jax.lax.fori_loop(start, start + count, tri_body,
                                         blocked)

            return jax.lax.cond(jnp.any(could) & (count > 0), run,
                                lambda b: b, blocked)

        if use_super:
            o_idx = _tile_octant(wrd.x, wrd.y, wrd.z)

            def super_body(si, blocked):
                s = _octant_perm(sup_ref, o_idx, si)
                # super slab test: same form, bounds from sup rows
                t0x = (sup_ref[s, 0] - wp1.x) * inv.x
                t1x = (sup_ref[s, 3] - wp1.x) * inv.x
                t0y = (sup_ref[s, 1] - wp1.y) * inv.y
                t1y = (sup_ref[s, 4] - wp1.y) * inv.y
                t0z = (sup_ref[s, 2] - wp1.z) * inv.z
                t1z = (sup_ref[s, 5] - wp1.z) * inv.z
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.maximum(jnp.minimum(t0z, t1z), MIN_D))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                could = (tn <= tf) & (tn < wmd) & (blocked == 0)
                cnt = sup_ref[s, 7].astype(jnp.int32)

                def descend(b):
                    return jax.lax.fori_loop(s * SUPER, (s + 1) * SUPER,
                                             cluster_body, b)

                return jax.lax.cond(jnp.any(could) & (cnt > 0), descend,
                                    lambda b: b, blocked)

            return jax.lax.fori_loop(0, cl_ref.shape[0] // SUPER,
                                     super_body, blocked)
        return jax.lax.fori_loop(0, cl_ref.shape[0], cluster_body, blocked)

    rows = p1.x.shape[0]
    sr = _inline_sub_rows(rows, cl_ref.shape[0])
    if sr == rows:
        blocked = walk(blocked, p1, rd, md)
    else:
        parts = []
        for st in range(rows // sr):
            w = slice(st * sr, st * sr + sr)
            parts.append(walk(
                blocked[w], V3(p1.x[w], p1.y[w], p1.z[w]),
                V3(rd.x[w], rd.y[w], rd.z[w]), md[w]))
        blocked = jnp.concatenate(parts, axis=0)
    return blocked != 0


def nearest_hit_inline(sph_ref, tri_ref, cl_ref, sup_ref, ro: V3, rd: V3, *,
                       ns, nl, nt, use_super=False):
    """In-kernel nearest hit (the _nearest_kernel sweep, plane-based):
    returns (t, normal, Mtl, flag) with flag 0=miss/1=surface/2=light.
    Mesh scenes run the cluster walk per sub-tile and descend
    octant-ordered supers front-to-back (the 2-level machinery of the
    standalone ``_nearest_kernel``) — without it a VMEM-resident 100k-tri
    mesh paid ~1.5k flat slab tests per bounce per tile."""
    from .pallas_intersect import SUPER, _octant_perm, _tile_octant
    zero = jnp.zeros_like(ro.x)
    best_t = jnp.full_like(ro.x, INF)
    bn = V3(zero, zero, zero)
    bbc = V3(zero, zero, zero)
    brough = zero
    bmetal = zero
    beta = zero
    bflag = jnp.zeros_like(ro.x, jnp.int32)

    def sph_body(i, c):
        best_t, bn, bbc, brough, bmetal, beta, bflag = c
        ctr = V3(sph_ref[i, 0], sph_ref[i, 1], sph_ref[i, 2])
        r = sph_ref[i, 3]
        oc = ro - ctr
        b = dot3(oc, rd)
        cq = dot3(oc, oc) - r * r
        h = b * b - cq
        sh = jnp.sqrt(jnp.maximum(h, 0.0))
        t1 = -b - sh
        t2 = -b + sh
        ok = (h >= 0.0) & (r > 0.0)
        v1 = ok & (t1 > EPSILON)
        v2 = ok & (t2 > EPSILON)
        t = jnp.where(v1, t1, jnp.where(v2, t2, INF))
        closer = t < best_t
        inv_r = 1.0 / jnp.maximum(r, 1e-20)
        nrm = (oc + rd.scale(t)).scale(inv_r)
        sel = lambda a, b2: jnp.where(closer, a, b2)
        flag = jnp.where(sph_ref[i, 14] > 0.0, 2, 1)
        return (sel(t, best_t), where3(closer, nrm, bn),
                where3(closer, V3(sph_ref[i, 8], sph_ref[i, 9],
                                  sph_ref[i, 10]), bbc),
                sel(sph_ref[i, 11], brough), sel(sph_ref[i, 12], bmetal),
                sel(sph_ref[i, 13], beta), jnp.where(closer, flag, bflag))

    carry = (best_t, bn, bbc, brough, bmetal, beta, bflag)
    carry = jax.lax.fori_loop(0, ns + nl, sph_body, carry)
    best_t, bn, bbc, brough, bmetal, beta, bflag = carry

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                               jnp.where(d >= 0.0, 1e-12, -1e-12), d)

    def walk(carry, wro, wrd):
        inv = V3(safe_inv(wrd.x), safe_inv(wrd.y), safe_inv(wrd.z))

        def tri_body(i, c):
            best_t, bn, bbc, brough, bmetal, beta, bflag = c
            v0 = V3(tri_ref[i, 0], tri_ref[i, 1], tri_ref[i, 2])
            e1 = V3(tri_ref[i, 3] - v0.x, tri_ref[i, 4] - v0.y,
                    tri_ref[i, 5] - v0.z)
            e2 = V3(tri_ref[i, 6] - v0.x, tri_ref[i, 7] - v0.y,
                    tri_ref[i, 8] - v0.z)
            h = cross3(wrd, e2)
            a = dot3(e1, h)
            parallel = (a > -1e-6) & (a < 1e-6)
            fi = 1.0 / jnp.where(parallel, 1.0, a)
            sv = wro - v0
            u = fi * dot3(sv, h)
            q = cross3(sv, e1)
            v = fi * dot3(wrd, q)
            t = fi * dot3(e2, q)
            ok = (~parallel & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (t > EPSILON))
            t = jnp.where(ok, t, INF)
            closer = t < best_t
            nrm = V3(jnp.broadcast_to(tri_ref[i, 12], t.shape),
                     jnp.broadcast_to(tri_ref[i, 13], t.shape),
                     jnp.broadcast_to(tri_ref[i, 14], t.shape))
            sel = lambda a2, b2: jnp.where(closer, a2, b2)
            return (sel(t, best_t), where3(closer, nrm, bn),
                    where3(closer, V3(tri_ref[i, 16], tri_ref[i, 17],
                                      tri_ref[i, 18]), bbc),
                    sel(tri_ref[i, 19], brough), sel(tri_ref[i, 20], bmetal),
                    sel(tri_ref[i, 21], beta),
                    jnp.where(closer, 1, bflag))

        def cluster_body(ci, c):
            best_t = c[0]
            t0x = (cl_ref[ci, 0] - wro.x) * inv.x
            t1x = (cl_ref[ci, 3] - wro.x) * inv.x
            t0y = (cl_ref[ci, 1] - wro.y) * inv.y
            t1y = (cl_ref[ci, 4] - wro.y) * inv.y
            t0z = (cl_ref[ci, 2] - wro.z) * inv.z
            t1z = (cl_ref[ci, 5] - wro.z) * inv.z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), EPSILON))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            could = (tn <= tf) & (tn < best_t)
            start = cl_ref[ci, 6].astype(jnp.int32)
            count = cl_ref[ci, 7].astype(jnp.int32)

            def run(c):
                return jax.lax.fori_loop(start, start + count, tri_body, c)

            return jax.lax.cond(jnp.any(could) & (count > 0), run,
                                lambda x: x, c)

        if use_super:
            o_idx = _tile_octant(wrd.x, wrd.y, wrd.z)

            def super_body(si, c):
                s = _octant_perm(sup_ref, o_idx, si)
                best_t = c[0]
                t0x = (sup_ref[s, 0] - wro.x) * inv.x
                t1x = (sup_ref[s, 3] - wro.x) * inv.x
                t0y = (sup_ref[s, 1] - wro.y) * inv.y
                t1y = (sup_ref[s, 4] - wro.y) * inv.y
                t0z = (sup_ref[s, 2] - wro.z) * inv.z
                t1z = (sup_ref[s, 5] - wro.z) * inv.z
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.maximum(jnp.minimum(t0z, t1z),
                                             EPSILON))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                could = (tn <= tf) & (tn < best_t)
                cnt = sup_ref[s, 7].astype(jnp.int32)

                def descend(c):
                    # children front-to-back (cl cols 8..15): near hits
                    # shrink best.t before far children's slab tests
                    def kbody(k, c):
                        return cluster_body(
                            s * SUPER + _octant_perm(
                                cl_ref, o_idx, s * SUPER + k), c)

                    return jax.lax.fori_loop(0, SUPER, kbody, c)

                return jax.lax.cond(jnp.any(could) & (cnt > 0), descend,
                                    lambda x: x, c)

            return jax.lax.fori_loop(0, cl_ref.shape[0] // SUPER,
                                     super_body, carry)
        return jax.lax.fori_loop(0, cl_ref.shape[0], cluster_body, carry)

    rows = ro.x.shape[0]
    sr = _inline_sub_rows(rows, cl_ref.shape[0])
    if sr == rows:
        carry = walk(carry, ro, rd)
    else:
        parts = []
        for st in range(rows // sr):
            w = slice(st * sr, st * sr + sr)
            cw = tuple(V3(f.x[w], f.y[w], f.z[w]) if isinstance(f, V3)
                       else f[w] for f in carry)
            parts.append(walk(cw, V3(ro.x[w], ro.y[w], ro.z[w]),
                              V3(rd.x[w], rd.y[w], rd.z[w])))
        carry = tuple(
            V3(jnp.concatenate([p[i].x for p in parts], 0),
               jnp.concatenate([p[i].y for p in parts], 0),
               jnp.concatenate([p[i].z for p in parts], 0))
            if isinstance(parts[0][i], V3)
            else jnp.concatenate([p[i] for p in parts], 0)
            for i in range(len(parts[0])))
    best_t, bn, bbc, brough, bmetal, beta, bflag = carry

    ndotd = dot3(bn, rd)
    sgn = jnp.where(ndotd > 0.0, -1.0, 1.0)
    bn = bn.scale(sgn)
    bflag = bflag * (best_t < INF).astype(jnp.int32)
    return best_t, bn, Mtl(bbc, brough, bmetal, beta), bflag


# ---------------------------------------------------------------------------
# the fused shade kernel
# ---------------------------------------------------------------------------

def _shade_core(sph_ref, tri_ref, cl_ref, sup_ref, light_ref, ro, rd, tp,
                eta, dep, act, last_delta, last_pdf, uu,
                *, ns, nl_lights, nt, clamp_val, stub_mis, blocks_col,
                use_super=False):
    """One fused bounce on in-register state: nearest hit -> light-ball
    emission -> NEE (with the in-kernel shadow sweep) -> BSDF sample.
    Shared by the per-bounce kernel and the persistent wavefront megakernel.
    Returns (radiance, new_ro, new_rd, new_tp, new_eta, new_dep, alive,
    is_delta, pdf, upd) — callers fold ``upd`` into their state update.
    """
    # in-kernel nearest hit: no HBM round trip for the hit attributes
    t_hit, n, m, flag = nearest_hit_inline(
        sph_ref, tri_ref, cl_ref, sup_ref, ro, rd,
        ns=ns, nl=nl_lights, nt=nt, use_super=use_super)
    return _shade_from_hit(
        sph_ref, tri_ref, cl_ref, sup_ref, light_ref, ro, rd, tp, eta, dep,
        act, last_delta, last_pdf, uu, t_hit, n, m, flag,
        ns=ns, nl_lights=nl_lights, nt=nt, clamp_val=clamp_val,
        stub_mis=stub_mis, blocks_col=blocks_col, use_super=use_super)


def _shade_from_hit(sph_ref, tri_ref, cl_ref, sup_ref, light_ref, ro, rd,
                    tp, eta, dep, act, last_delta, last_pdf, uu, t_hit, n,
                    m, flag, *, ns, nl_lights, nt, clamp_val, stub_mis,
                    blocks_col, use_super=False):
    """The post-intersection body of ``_shade_core``: light-ball emission,
    NEE with the in-kernel shadow sweep, BSDF sample.  Split out so the
    textured per-bounce kernel can inject EXTERNAL hit attributes (the hit
    comes from the ``with_uv`` nearest kernel and the atlas texel — fetched
    by a batched XLA gather between the kernels, since Mosaic has no
    per-lane gather — is pre-multiplied into ``m.bc``)."""
    pos = ro + rd.scale(t_hit)
    hit_ok = flag > 0
    is_light = flag == 2
    act = act & hit_ok
    wo = -rd
    zero = jnp.zeros_like(t_hit)
    radiance = V3(zero, zero, zero)

    # ---- 1. light-ball emission (pt_cu.cu:59-121) ----
    # match the hit against the light table (first |dist-r| < 1e-2 wins)
    found = jnp.zeros_like(t_hit, jnp.int32)
    e_area = jnp.ones_like(t_hit)
    e_cut = zero
    e_par = jnp.zeros_like(t_hit, jnp.int32)
    e_dx = zero
    e_dy = zero
    e_dz = zero
    e_ix = zero
    e_iy = zero
    e_iz = zero
    c2hx = zero
    c2hy = zero
    c2hz = zero

    def light_match(i, carry):
        (found, e_area, e_cut, e_par, e_dx, e_dy, e_dz, e_ix, e_iy, e_iz,
         c2hx, c2hy, c2hz) = carry
        lp = V3(light_ref[i, 0], light_ref[i, 1], light_ref[i, 2])
        r = light_ref[i, 11]
        c2h = pos - lp
        match = (jnp.abs(norm3(c2h) - r) < 1e-2) & (found == 0)
        sel = lambda a, b: jnp.where(match, a, b)
        return (jnp.where(match, 1, found),
                sel(4.0 * PI * r * r, e_area),
                sel(light_ref[i, 9], e_cut),
                jnp.where(match, (light_ref[i, 10] > 0.0).astype(jnp.int32),
                          e_par),
                sel(light_ref[i, 3], e_dx), sel(light_ref[i, 4], e_dy),
                sel(light_ref[i, 5], e_dz),
                sel(light_ref[i, 6], e_ix), sel(light_ref[i, 7], e_iy),
                sel(light_ref[i, 8], e_iz),
                sel(c2h.x, c2hx), sel(c2h.y, c2hy), sel(c2h.z, c2hz))

    (found, e_area, e_cut, e_par, e_dx, e_dy, e_dz, e_ix, e_iy, e_iz,
     c2hx, c2hy, c2hz) = jax.lax.fori_loop(
        0, nl_lights, light_match,
        (found, e_area, e_cut, e_par, e_dx, e_dy, e_dz, e_ix, e_iy, e_iz,
         c2hx, c2hy, c2hz))

    main_dir = normalize3(V3(e_dx, e_dy, e_dz))
    c2h_dir = normalize3(V3(c2hx, c2hy, c2hz))
    spot = (e_cut > 0.0) & (e_par == 0)
    behind = dot3(main_dir, c2h_dir) < jnp.cos(e_cut)
    cone = jnp.where(spot, (1.0 - jnp.cos(e_cut)) / 2.0, 1.0)
    cone = jnp.where(spot & (dep == 0), 1.0, cone)
    cone = jnp.where(spot & (dep != 0) & behind, 0.0, cone)
    e_ok = (found != 0) & (cone > 0.0)
    inv_ac = 1.0 / jnp.maximum(e_area * cone, 1e-20)
    emission = where3(e_ok, V3(e_ix * inv_ac, e_iy * inv_ac, e_iz * inv_ac),
                      V3(zero, zero, zero))
    has_e = (emission.x > 0.0) | (emission.y > 0.0) | (emission.z > 0.0)

    c_delta = tp.mul(emission)
    c_delta = where3(valid3(c_delta), clamp3(c_delta, clamp_val),
                     V3(zero, zero, zero))
    if stub_mis:
        light_contrib = where3(last_delta, c_delta, V3(zero, zero, zero))
    else:
        cos_l = jnp.maximum(dot3(n, wo), 1e-6)
        pdf_l = (1.0 / (nl_lights * e_area)) * t_hit * t_hit / cos_l
        p_b = last_pdf * last_pdf
        p_l = pdf_l * pdf_l
        mis_w = p_b / jnp.maximum(p_b + p_l, 1e-8)
        c_mis = tp.mul(emission).scale(mis_w)
        c_mis = where3((found != 0) & valid3(c_mis),
                       clamp3(c_mis, clamp_val), V3(zero, zero, zero))
        light_contrib = where3(last_delta, c_delta, c_mis)
    add_light = act & is_light & has_e
    radiance = radiance + where3(add_light, light_contrib,
                                 V3(zero, zero, zero))

    alive = act & ~is_light

    # ---- 2. NEE (pt_cu.cu:125-201) ----
    elig = (alive & (m.eta <= 0.0) & ((m.metal < 0.99) | (m.rough > 0.01)))
    li = jnp.minimum((uu[0] * nl_lights).astype(jnp.int32), nl_lights - 1)

    # gather the chosen light's row via a match loop (no vector gathers)
    l_px = zero; l_py = zero; l_pz = zero
    l_dxx = zero; l_dyy = zero; l_dzz = zero
    l_ix = zero; l_iy = zero; l_iz = zero
    l_cut = zero; l_parf = zero; l_r = zero

    def pick(i, c):
        (l_px, l_py, l_pz, l_dxx, l_dyy, l_dzz, l_ix, l_iy, l_iz, l_cut,
         l_parf, l_r) = c
        sel = li == i
        g = lambda j, old: jnp.where(sel, light_ref[i, j], old)
        return (g(0, l_px), g(1, l_py), g(2, l_pz), g(3, l_dxx), g(4, l_dyy),
                g(5, l_dzz), g(6, l_ix), g(7, l_iy), g(8, l_iz), g(9, l_cut),
                g(10, l_parf), g(11, l_r))

    (l_px, l_py, l_pz, l_dxx, l_dyy, l_dzz, l_ix, l_iy, l_iz, l_cut, l_parf,
     l_r) = jax.lax.fori_loop(0, nl_lights, pick,
                              (l_px, l_py, l_pz, l_dxx, l_dyy, l_dzz, l_ix,
                               l_iy, l_iz, l_cut, l_parf, l_r))
    l_pos = V3(l_px, l_py, l_pz)
    l_dir = V3(l_dxx, l_dyy, l_dzz)
    l_illum = V3(l_ix, l_iy, l_iz)
    l_par = l_parf > 0.0

    pdir = normalize3(-l_dir)
    # uniform point on the light ball
    zc = 1.0 - 2.0 * uu[1]
    rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - zc * zc))
    ph = 2.0 * PI * uu[2]
    d_loc = V3(rr * jnp.cos(ph), rr * jnp.sin(ph), zc)
    lp = l_pos + d_loc.scale(l_r)
    wi_vec = lp - pos
    dist2 = dot3(wi_vec, wi_vec)
    dist = jnp.sqrt(dist2)
    wi_sph = wi_vec.scale(1.0 / jnp.maximum(dist, 1e-20))
    wi = where3(l_par, pdir, wi_sph)
    cos_surf = jnp.maximum(0.0, dot3(n, wi))
    cos_light = jnp.maximum(0.0, dot3(d_loc, -wi_sph))
    # boolean algebra, not select: Mosaic can't select over i1/i8 vectors
    inside = l_par | (l_cut <= 0.0) | (
        dot3(normalize3(l_dir), -wi_sph) >= jnp.cos(l_cut))

    p2 = where3(l_par, pos + pdir.scale(1e4), lp + d_loc.scale(EPSILON))
    blocked = shadow_blocked(sph_ref, tri_ref, cl_ref, sup_ref,
                             pos + n.scale(EPSILON), p2,
                             ns=ns, nl=nl_lights, nt=nt,
                             blocks_col=blocks_col, use_super=use_super)
    tr = jnp.where(blocked, 0.0, 1.0)

    brdf, pdf_b = eval_pdf_world(m, wo, wi, n)
    # contrib = throughput * brdf * illum * ... (pt_cu.cu:142-143,193-195):
    # the path throughput scales BOTH light kinds before validity/clamp
    contrib_par = tp.mul(brdf).mul(l_illum).scale(
        tr * cos_surf * float(nl_lights))
    area = 4.0 * PI * l_r * l_r
    pdf_area = 1.0 / (nl_lights * area)
    pdf_ld = pdf_area * dist2 / jnp.maximum(cos_light, 1e-6)
    p_l2 = pdf_ld * pdf_ld
    p_b2 = pdf_b * pdf_b
    mis = p_l2 / jnp.maximum(p_l2 + p_b2, 1e-8)
    contrib_sph = tp.mul(brdf).mul(l_illum).scale(
        tr * cos_surf / pdf_ld * mis)
    gate_par = (cos_surf > 0.0) & (tr > 0.0)
    gate_sph = ((cos_surf > 0.0) & (cos_light > 0.0) & inside & (tr > 0.0))
    nee = where3(l_par, where3(gate_par, contrib_par, V3(zero, zero, zero)),
                 where3(gate_sph, contrib_sph, V3(zero, zero, zero)))
    nee = where3(valid3(nee), clamp3(nee, clamp_val), V3(zero, zero, zero))
    radiance = radiance + where3(elig, nee, V3(zero, zero, zero))

    # ---- 3. BSDF sample + state update (pt_cu.cu:204-241) ----
    wi_b, val, pdf, is_delta, new_eta = bsdf_sample_k(
        m, wo, n, uu[3], uu[4], uu[5], eta)
    dead = (pdf <= 0.0) & ~is_delta
    alive = alive & ~dead
    cos_wi = jnp.abs(dot3(n, wi_b))
    w = jnp.where(is_delta, 1.0, cos_wi / jnp.maximum(pdf, 1e-20))
    new_tp = tp.mul(val).scale(w)
    alive = alive & valid3(new_tp)
    off = where3(dot3(wi_b, n) < 0.0, -n, n).scale(EPSILON)
    new_ro = where3(is_delta, pos + off, pos + n.scale(EPSILON))
    new_dep = dep + jnp.where(is_delta, 0, 1)

    upd = act & ~is_light
    return (radiance, new_ro, wi_b, new_tp, new_eta, new_dep, alive,
            is_delta, pdf, upd)


def _shade_kernel(sph_ref, tri_ref, cl_ref, sup_ref, light_ref,
                  # ray
                  ox, oy, oz, dx, dy, dz,
                  # path state
                  tpx, tpy, tpz, etas, depth, act_in, last_delta_in,
                  last_pdf_in,
                  # uniforms
                  u0, u1, u2, u3, u4, u5,
                  # outputs
                  rad_x, rad_y, rad_z, nox, noy, noz, ndx, ndy, ndz,
                  ntx, nty, ntz, neta, ndepth, nalive, ndelta, npdf,
                  *, ns, nl_lights, nt, clamp_val, stub_mis, blocks_col,
                  use_super):
    ro = V3(ox[...], oy[...], oz[...])
    rd = V3(dx[...], dy[...], dz[...])
    tp = V3(tpx[...], tpy[...], tpz[...])
    eta = etas[...]
    dep = depth[...]
    act = act_in[...] != 0
    last_delta = last_delta_in[...] != 0
    last_pdf = last_pdf_in[...]
    uu = [u0[...], u1[...], u2[...], u3[...], u4[...], u5[...]]

    (radiance, new_ro, wi_b, new_tp, new_eta, new_dep, alive, is_delta,
     pdf, upd) = _shade_core(
        sph_ref, tri_ref, cl_ref, sup_ref, light_ref, ro, rd, tp, eta, dep,
        act, last_delta, last_pdf, uu, ns=ns, nl_lights=nl_lights, nt=nt,
        clamp_val=clamp_val, stub_mis=stub_mis, blocks_col=blocks_col,
        use_super=use_super)

    rad_x[...] = radiance.x
    rad_y[...] = radiance.y
    rad_z[...] = radiance.z
    nox[...] = jnp.where(upd, new_ro.x, ro.x)
    noy[...] = jnp.where(upd, new_ro.y, ro.y)
    noz[...] = jnp.where(upd, new_ro.z, ro.z)
    ndx[...] = jnp.where(upd, wi_b.x, rd.x)
    ndy[...] = jnp.where(upd, wi_b.y, rd.y)
    ndz[...] = jnp.where(upd, wi_b.z, rd.z)
    ntx[...] = jnp.where(upd, new_tp.x, tp.x)
    nty[...] = jnp.where(upd, new_tp.y, tp.y)
    ntz[...] = jnp.where(upd, new_tp.z, tp.z)
    neta[...] = jnp.where(upd, new_eta, eta)
    ndepth[...] = jnp.where(upd, new_dep, dep)
    # Mosaic can't select over i1 vectors: cast masks to i32 first
    # (upd == act & ~is_light, the old else-branch value)
    nalive[...] = jnp.where(upd, alive.astype(jnp.int32),
                            upd.astype(jnp.int32))
    ndelta[...] = jnp.where(upd, is_delta.astype(jnp.int32),
                            last_delta.astype(jnp.int32))
    npdf[...] = jnp.where(upd & ~is_delta, pdf, last_pdf)


def shade_step_pallas(scene: Scene, light_tab, ro, rd, tp, eta, depth,
                      act, last_delta, last_pdf, u, *, clamp_val, stub_mis,
                      dielectrics_block):
    """Run one fused bounce (nearest hit + emission + NEE + sample) in a
    single kernel.  ``u`` is (6, B) uniforms.  Returns a dict of updated
    state + the radiance contribution of this bounce."""
    B = ro.shape[0]
    sph_tab, tri_tab, cl_tab, ns, nl, nt = pack_scene(scene)
    cl_tab, sup_tab, use_super = super_table(cl_tab)

    comps = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
             tp[:, 0], tp[:, 1], tp[:, 2], eta, depth,
             act.astype(jnp.int32), last_delta.astype(jnp.int32), last_pdf,
             u[0], u[1], u[2], u[3], u[4], u[5]]
    rows = tile_rows(False)   # PT_TPU_TILE_ROWS A/B rides along (round 4)
    tiled = [_tile(c, rows)[0] for c in comps]
    rows_total = tiled[0].shape[0]
    grid = rows_total // rows

    kernel = functools.partial(
        _shade_kernel, ns=ns, nl_lights=nl, nt=nt, clamp_val=clamp_val,
        stub_mis=stub_mis, blocks_col=4 if dielectrics_block else 5,
        use_super=use_super)
    # rad3, ro3, rd3, tp3, eta | depth, alive, delta | last_pdf
    out_dtypes = ([jnp.float32] * 13
                  + [jnp.int32, jnp.int32, jnp.int32, jnp.float32])
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
            pl.BlockSpec(light_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *_ray_specs(len(comps), rows),
        ],
        out_specs=[pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in out_dtypes],
        out_shape=[jax.ShapeDtypeStruct((rows_total, LANE), dt)
                   for dt in out_dtypes],
        interpret=interp_forced(),
    )(sph_tab, tri_tab, cl_tab, sup_tab, light_tab, *tiled)

    # NOTE: output order must match _shade_kernel's signature
    names = ["rad_x", "rad_y", "rad_z", "ox", "oy", "oz", "dx", "dy", "dz",
             "tx", "ty", "tz", "eta", "depth", "alive", "delta", "last_pdf"]
    flat = {nm: o.reshape(-1)[:B] for nm, o in zip(names, outs)}
    return dict(
        radiance=jnp.stack([flat["rad_x"], flat["rad_y"], flat["rad_z"]], -1),
        ro=jnp.stack([flat["ox"], flat["oy"], flat["oz"]], -1),
        rd=jnp.stack([flat["dx"], flat["dy"], flat["dz"]], -1),
        tp=jnp.stack([flat["tx"], flat["ty"], flat["tz"]], -1),
        eta=flat["eta"],
        depth=flat["depth"],
        alive=flat["alive"] != 0,
        last_is_delta=flat["delta"] != 0,
        last_pdf=flat["last_pdf"],
    )


def _shade_tex_kernel(sph_ref, tri_ref, cl_ref, sup_ref, light_ref,
                      # ray
                      ox, oy, oz, dx, dy, dz,
                      # path state
                      tpx, tpy, tpz, etas, depth, act_in, last_delta_in,
                      last_pdf_in,
                      # uniforms
                      u0, u1, u2, u3, u4, u5,
                      # external hit attributes (from the with_uv nearest
                      # kernel; base color already texel-modulated)
                      ht, hnx, hny, hnz, hbcr, hbcg, hbcb, hrough, hmetal,
                      hmeta, hflag,
                      # outputs
                      rad_x, rad_y, rad_z, nox, noy, noz, ndx, ndy, ndz,
                      ntx, nty, ntz, neta, ndepth, nalive, ndelta, npdf,
                      *, ns, nl_lights, nt, clamp_val, stub_mis, blocks_col,
                      use_super):
    ro = V3(ox[...], oy[...], oz[...])
    rd = V3(dx[...], dy[...], dz[...])
    tp = V3(tpx[...], tpy[...], tpz[...])
    eta = etas[...]
    dep = depth[...]
    act = act_in[...] != 0
    last_delta = last_delta_in[...] != 0
    last_pdf = last_pdf_in[...]
    uu = [u0[...], u1[...], u2[...], u3[...], u4[...], u5[...]]
    t_hit = ht[...]
    n = V3(hnx[...], hny[...], hnz[...])
    m = Mtl(V3(hbcr[...], hbcg[...], hbcb[...]), hrough[...], hmetal[...],
            hmeta[...])
    flag = hflag[...]

    (radiance, new_ro, wi_b, new_tp, new_eta, new_dep, alive, is_delta,
     pdf, upd) = _shade_from_hit(
        sph_ref, tri_ref, cl_ref, sup_ref, light_ref, ro, rd, tp, eta, dep,
        act, last_delta, last_pdf, uu, t_hit, n, m, flag, ns=ns,
        nl_lights=nl_lights, nt=nt, clamp_val=clamp_val, stub_mis=stub_mis,
        blocks_col=blocks_col, use_super=use_super)

    rad_x[...] = radiance.x
    rad_y[...] = radiance.y
    rad_z[...] = radiance.z
    nox[...] = jnp.where(upd, new_ro.x, ro.x)
    noy[...] = jnp.where(upd, new_ro.y, ro.y)
    noz[...] = jnp.where(upd, new_ro.z, ro.z)
    ndx[...] = jnp.where(upd, wi_b.x, rd.x)
    ndy[...] = jnp.where(upd, wi_b.y, rd.y)
    ndz[...] = jnp.where(upd, wi_b.z, rd.z)
    ntx[...] = jnp.where(upd, new_tp.x, tp.x)
    nty[...] = jnp.where(upd, new_tp.y, tp.y)
    ntz[...] = jnp.where(upd, new_tp.z, tp.z)
    neta[...] = jnp.where(upd, new_eta, eta)
    ndepth[...] = jnp.where(upd, new_dep, dep)
    nalive[...] = jnp.where(upd, alive.astype(jnp.int32),
                            upd.astype(jnp.int32))
    ndelta[...] = jnp.where(upd, is_delta.astype(jnp.int32),
                            last_delta.astype(jnp.int32))
    npdf[...] = jnp.where(upd & ~is_delta, pdf, last_pdf)


def shade_step_tex_pallas(scene: Scene, light_tab, hit, bc_mod, ro, rd, tp,
                          eta, depth, act, last_delta, last_pdf, u, *,
                          clamp_val, stub_mis, dielectrics_block):
    """Textured per-bounce fused shade: like ``shade_step_pallas`` but the
    nearest hit comes from the ``with_uv`` Pallas kernel and the atlas texel
    (a batched XLA gather between the two kernels — Mosaic has no per-lane
    gather) arrives pre-multiplied into ``bc_mod``.  Closes most of the
    fused-tier gap for textured scenes (BASELINE config 3): only the hit
    attributes round-trip HBM, not the whole shade pipeline.

    ``hit`` is the dict from ``nearest_hit_pallas(..., with_uv=True)``."""
    B = ro.shape[0]
    sph_tab, tri_tab, cl_tab, ns, nl, nt = pack_scene(scene)
    cl_tab, sup_tab, use_super = super_table(cl_tab)

    comps = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
             tp[:, 0], tp[:, 1], tp[:, 2], eta, depth,
             act.astype(jnp.int32), last_delta.astype(jnp.int32), last_pdf,
             u[0], u[1], u[2], u[3], u[4], u[5],
             hit["t"], hit["nx"], hit["ny"], hit["nz"],
             bc_mod[:, 0], bc_mod[:, 1], bc_mod[:, 2],
             hit["rough"], hit["metal"], hit["eta"],
             hit["flag"]]
    # 64-row tiles (round-4 A/B: +13% on the textured 81,920-tri shape);
    # PT_TPU_TILE_ROWS overrides for re-sweeps.  nt routes the >100k-tri
    # VMEM budget fallback (ADVICE r4 item 3)
    rows = tile_rows(False, tex=True, nt=nt)
    tiled = [_tile(c, rows)[0] for c in comps]
    rows_total = tiled[0].shape[0]
    grid = rows_total // rows

    kernel = functools.partial(
        _shade_tex_kernel, ns=ns, nl_lights=nl, nt=nt, clamp_val=clamp_val,
        stub_mis=stub_mis, blocks_col=4 if dielectrics_block else 5,
        use_super=use_super)
    out_dtypes = ([jnp.float32] * 13
                  + [jnp.int32, jnp.int32, jnp.int32, jnp.float32])
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
            pl.BlockSpec(light_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *_ray_specs(len(comps), rows),
        ],
        out_specs=[pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in out_dtypes],
        out_shape=[jax.ShapeDtypeStruct((rows_total, LANE), dt)
                   for dt in out_dtypes],
        interpret=interp_forced(),
    )(sph_tab, tri_tab, cl_tab, sup_tab, light_tab, *tiled)

    names = ["rad_x", "rad_y", "rad_z", "ox", "oy", "oz", "dx", "dy", "dz",
             "tx", "ty", "tz", "eta", "depth", "alive", "delta", "last_pdf"]
    flat = {nm: o.reshape(-1)[:B] for nm, o in zip(names, outs)}
    return dict(
        radiance=jnp.stack([flat["rad_x"], flat["rad_y"], flat["rad_z"]], -1),
        ro=jnp.stack([flat["ox"], flat["oy"], flat["oz"]], -1),
        rd=jnp.stack([flat["dx"], flat["dy"], flat["dz"]], -1),
        tp=jnp.stack([flat["tx"], flat["ty"], flat["tz"]], -1),
        eta=flat["eta"],
        depth=flat["depth"],
        alive=flat["alive"] != 0,
        last_is_delta=flat["delta"] != 0,
        last_pdf=flat["last_pdf"],
    )


# ---------------------------------------------------------------------------
# persistent wavefront megakernel: the WHOLE path loop in one kernel
# ---------------------------------------------------------------------------
#
# The per-bounce pipeline streams ~37 (B,) state arrays through HBM every
# bounce (one pallas_call per while_loop iteration).  This kernel keeps the
# entire wavefront — regeneration, bounce loop, accumulation — resident in
# VMEM per ray tile: each grid step seeds the on-core PRNG, loops until its
# own lanes have finished all ``spp`` samples, and writes only the final
# per-pixel radiance sums.  State never leaves the chip.
#
# RNG: pltpu.prng_random_bits per iteration, seeded per tile.  The stream
# differs from the XLA path's Threefry draws, so equivalence vs the
# per-bounce path is statistical (same estimator, different sample points) —
# tests/test_megakernel.py checks converged-image agreement; renders stay
# bit-reproducible per (seed, tile layout).

def _u01(shape):
    """Uniform (0,1] draw from the on-core PRNG (curand_uniform support)."""
    bits = pltpu.prng_random_bits(shape)
    # take the top 24 bits via an i32-safe shift; (bits24 + 1) / 2^24 in (0,1]
    b24 = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32),
                                      jnp.uint32(8)).astype(jnp.int32)
    return (b24.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)


def _u01_hash(shape, seed, it, k):
    """Stateless counter-based uniform (0,1] — the PT_TPU_INTERPRET stand-in
    for the on-core PRNG (``pltpu.prng_seed`` has no CPU lowering).  One
    murmur3-fmix32 avalanche over (lane position, tile seed, loop iteration,
    draw index); a DIFFERENT stream than hardware, so megakernel-vs-XLA
    equivalence stays statistical either way, and renders remain
    bit-reproducible per (seed, layout) on each backend."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(0x10001) + c) ^ (
        seed.astype(jnp.uint32) * jnp.uint32(2654435761))
    x = x + it.astype(jnp.uint32) * jnp.uint32(0x9E3779B9) + jnp.uint32(
        (k * 0x85EBCA6B) & 0xFFFFFFFF)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    b24 = (x >> jnp.uint32(8)).astype(jnp.int32)
    return (b24.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)


def _draws(shape, n, seed, it):
    """n fresh uniforms for one megakernel loop iteration (trace-time
    backend pick: hardware PRNG on TPU, counter hash under interpret)."""
    if interp_forced():
        return [_u01_hash(shape, seed, it, k) for k in range(n)]
    return [_u01(shape) for _ in range(n)]


def _wavefront_kernel(sph_ref, tri_ref, cl_ref, sup_ref, light_ref,
                      cam_ref, seed_ref, pxr, pyr,
                      img_x, img_y, img_z,
                      *, ns, nl_lights, nt, clamp_val, stub_mis, blocks_col,
                      spp, eye_depth, max_path_iters, max_total, use_super):
    seed = seed_ref[0] + pl.program_id(0)
    if not interp_forced():
        pltpu.prng_seed(seed)
    px = pxr[...]
    py = pyr[...]
    eye = V3(cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
    ul = V3(cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5])
    cdx = V3(cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8])
    cdy = V3(cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11])

    # derive the zero tiles from loaded data, not constants: constant inits
    # get a replicated Mosaic layout that the loop carry can't relayout from
    zero = px * 0.0
    zero_i = zero.astype(jnp.int32)
    eye_b = V3(zero + eye.x, zero + eye.y, zero + eye.z)

    def primary(jx, jy):
        fx = px + jx
        fy = py + jy
        d = V3(ul.x + cdx.x * fx + cdy.x * fy - eye.x,
               ul.y + cdx.y * fx + cdy.y * fy - eye.y,
               ul.z + cdx.z * fx + cdy.z * fy - eye.z)
        return normalize3(d)

    def cond(c):
        # the work flag is reduced at the END of the body — reductions in
        # the while cond itself hit a Mosaic relayout bug
        (it, work, *_rest) = c
        return (it < max_total) & (work != 0)

    def body(c):
        (it, work, sample, path_it, ro, rd, tp, rad, img, eta, dep, alive_i,
         last_delta_i, last_pdf) = c
        u = _draws(px.shape, 8, seed, it)
        alive = alive_i != 0

        # ---- regenerate dead lanes that still owe samples ----
        regen = ~alive & (sample < spp)
        rd_new = primary(u[6], u[7])
        ro = where3(regen, eye_b, ro)
        rd = where3(regen, rd_new, rd)
        tp = where3(regen, V3(1.0 - zero, 1.0 - zero, 1.0 - zero), tp)
        rad = where3(regen, V3(zero, zero, zero), rad)
        eta = jnp.where(regen, 1.0, eta)
        dep = jnp.where(regen, 0, dep)
        path_it = jnp.where(regen, 0, path_it)
        # boolean algebra, not select: Mosaic can't select i1 vectors
        last_delta = regen | (last_delta_i != 0)
        last_pdf = jnp.where(regen, 1.0, last_pdf)
        sample = sample + regen.astype(jnp.int32)
        alive = alive | regen

        # ---- one fused bounce ----
        (brad, new_ro, wi_b, new_tp, new_eta, new_dep, b_alive, is_delta,
         pdf, upd) = _shade_core(
            sph_ref, tri_ref, cl_ref, sup_ref, light_ref, ro, rd, tp, eta,
            dep, alive, last_delta, last_pdf, u[:6], ns=ns,
            nl_lights=nl_lights, nt=nt, clamp_val=clamp_val,
            stub_mis=stub_mis, blocks_col=blocks_col, use_super=use_super)
        rad = rad + brad
        ro = where3(upd, new_ro, ro)
        rd = where3(upd, wi_b, rd)
        tp = where3(upd, new_tp, tp)
        eta = jnp.where(upd, new_eta, eta)
        dep = jnp.where(upd, new_dep, dep)
        out_delta = ((upd & is_delta) | (~upd & last_delta))
        last_pdf = jnp.where(upd & ~is_delta, pdf, last_pdf)
        # b_alive is False for lanes that missed/hit a light/died
        alive_out = (upd & b_alive) & (is_delta | (new_dep < eye_depth))
        path_it = jnp.where(alive, path_it + 1, path_it)
        alive_out = alive_out & (path_it < max_path_iters)

        # ---- flush finished paths into the image ----
        died = alive & ~alive_out
        flush = died & valid3(rad)
        img = img + where3(flush, rad, V3(zero, zero, zero))
        rad = where3(died, V3(zero, zero, zero), rad)

        new_work = (jnp.any(alive_out) | jnp.any(sample < spp)).astype(
            jnp.int32)
        return (it + 1, new_work, sample, path_it, ro, rd, tp, rad, img,
                eta, dep, alive_out.astype(jnp.int32),
                out_delta.astype(jnp.int32), last_pdf)

    init = (jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32), zero_i,
            zero_i, eye_b, V3(zero, zero, zero),
            V3(1.0 - zero, 1.0 - zero, 1.0 - zero), V3(zero, zero, zero),
            V3(zero, zero, zero), 1.0 - zero, zero_i, zero_i,
            zero_i + 1, 1.0 - zero)
    c = jax.lax.while_loop(cond, body, init)
    (_, _, _, _, _, _, _, rad, img, _, _, alive_i, _, _) = c
    # paths cut by the global cap still contribute what they gathered
    leftover = (alive_i != 0) & valid3(rad)
    img = img + where3(leftover, rad, V3(*(jnp.zeros_like(rad.x),) * 3))
    img_x[...] = img.x
    img_y[...] = img.y
    img_z[...] = img.z


def render_wavefront_pallas(scene: Scene, light_tab, cam, px, py, spp: int,
                            cfg, seed) -> jnp.ndarray:
    """Full PT wavefront (all spp samples, regeneration, bounded bounce
    loop) in ONE pallas_call.  Returns the per-pixel radiance SUM (B, 3)."""
    B = px.shape[0]
    sph_tab, tri_tab, cl_tab, ns, nl, nt = pack_scene(scene)
    cl_tab, sup_tab, use_super = super_table(cl_tab)
    cam_row = jnp.zeros((1, LANE), jnp.float32)
    cam_row = cam_row.at[0, 0:3].set(cam.eye)
    cam_row = cam_row.at[0, 3:6].set(cam.ul)
    cam_row = cam_row.at[0, 6:9].set(cam.dx)
    cam_row = cam_row.at[0, 9:12].set(cam.dy)
    seed_arr = jnp.asarray([seed], jnp.int32)

    rows = mega_rows(px.shape[0])
    pxt = _tile(px.astype(jnp.float32), rows)[0]
    pyt = _tile(py.astype(jnp.float32), rows)[0]
    rows_total = pxt.shape[0]
    grid = rows_total // rows

    max_total = spp * cfg.max_eye_iters + cfg.max_eye_iters
    kernel = functools.partial(
        _wavefront_kernel, ns=ns, nl_lights=nl, nt=nt, clamp_val=cfg.clamp,
        stub_mis=cfg.pt_stub_mis_strategy_a,
        blocks_col=4 if cfg.shadow_dielectrics_block else 5,
        spp=spp, eye_depth=cfg.eye_depth,
        max_path_iters=cfg.max_eye_iters, max_total=max_total,
        use_super=use_super)
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
            pl.BlockSpec(light_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *_ray_specs(2, rows),
        ],
        out_specs=[pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM) for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((rows_total, LANE), jnp.float32)
                   for _ in range(3)],
        interpret=interp_forced(),
    )(sph_tab, tri_tab, cl_tab, sup_tab, light_tab, cam_row, seed_arr,
      pxt, pyt)
    return jnp.stack([o.reshape(-1)[:B] for o in outs], -1)
