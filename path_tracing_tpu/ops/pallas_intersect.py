"""Pallas TPU kernels for the intersection hot path.

The pure-XLA brute force in ops/intersect.py materializes ``(B, N, 3)``
intermediates in HBM (cross products, edge vectors, ...) — at 1080p that is
gigabytes of traffic per bounce and the renderer becomes bandwidth-bound.
These kernels invert the loop structure: rays stream through VMEM in tiles
ONCE, and the primitive loop runs per-tile over a small scene table held in
VMEM, keeping every intermediate in registers.  Traffic per nearest-hit
drops from ~2 KB/ray to ~40 B/ray.

Two kernels:
- ``nearest_hit``: per-ray closest (t, global primitive index) over
  spheres + light balls + triangles, with the reference's category
  tie-breaking (spheres, then light balls, then triangles; strictly-closer
  wins — geometric.cuh:327-388).  Hit attribute/material gathers stay in
  cheap (B,) XLA ops outside the kernel.
- ``any_blocker``: shadow-ray test with per-ray max distance and a
  per-primitive "can block" mask (encodes the GPU/CPU dielectric rules of
  ``check_visibility`` / ``cpu_check_visibility``).

Scene tables are packed as two f32 matrices (see ``pack_scene``):
  spheres+balls: rows [cx, cy, cz, r, blocks_gpu, blocks_cpu, pad, pad]
  triangles:     rows [v0 v1 v2 (9), blocks_gpu, blocks_cpu, pad]
padded to multiples of 8 rows for clean VMEM tiling.

Rays are passed SoA as six (B,) component arrays reshaped to (B/128, 128)
tiles (TPU lane layout).  B is padded to a multiple of the tile size by the
wrapper; padded lanes get degenerate rays and their results are discarded.
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

INF = 1e20
LANE = 128
SUB = 8          # f32 sublane
TILE_ROWS = 32   # rows of 128 lanes per grid step -> 4096 rays/tile

# HBM-streamed triangle tables (meshes too large for a VMEM-resident
# table) pack as VPU slot rows; clusters stay whole numbers of TB-triangle
# blocks so per-cluster DMA windows are block-aligned.
#
# HISTORY: a determinant-form MXU sweep backend (per-32-triangle
# (16,128)x(16,128) dot_generals, PT_TPU_STREAM_SWEEP=mxu) existed through
# round 2 and was REMOVED: hardware A/Bs 2026-08-19 (327k-tri icosphere,
# 1080p spp=4, docs/measurements_r2.jsonl) measured vpu 1.003 Mpaths/s vs
# mxu-HIGHEST 0.475 and mxu-bf16 0.155 (4x the DMA bytes + triple-pass
# HIGHEST matmuls), and the MXU form's DMA crashed the TPU worker with a
# kernel fault at 163k tris / 1080p spp16 (the `vmem100k` sweep step).
# Slower in both precision forms AND the only knob that could fault the
# worker -> deleted rather than guarded (VERDICT r2 item 1).
TB = 32            # triangles per block (cluster alignment unit)

# VPU-sweep streaming table: 8 slots of 16 lanes per row
VPU_SLOT = 16
VPU_TPR = 128 // VPU_SLOT          # triangles per row
VPU_ROWS_PER_BLK = TB // VPU_TPR   # rows per 32-triangle block
VPU_WINDOW = 32                    # rows per DMA chunk = 8 blocks


def interp_forced() -> bool:
    """PT_TPU_INTERPRET=1 runs every non-PRNG Pallas kernel in interpret
    mode, which executes on ANY backend (including the CPU test mesh) —
    the kernels become correctness-testable without TPU hardware.  The two
    persistent megakernels are excluded: ``pltpu.prng_seed`` has no CPU
    lowering.  Trace-time decision like the other knobs: A/B toggles must
    ``jax.clear_caches()``."""
    return os.environ.get("PT_TPU_INTERPRET") == "1"

# 2-level cluster culling: the median-split builder emits clusters in DFS
# order, so SUPER consecutive clusters form a spatially tight run; testing
# their union AABB first skips SUPER child tests at once.  Results are
# bit-identical (culling never changes the nearest hit / blocker verdict).
SUPER = 16
SUPER_MIN_CLUSTERS = 64   # below this the flat loop is already cheap


def mega_rows(nlanes: int | None = None) -> int:
    """Ray-tile rows for the persistent megakernels (PT and BDPT eye share
    the env knob so A/B sweeps stay comparable).  Measured sweep (PT
    megakernel, mis_test): 8 rows 4x SLOWER than 32, 128 ~1.5x faster than
    32, 256 OOMs the 16M VMEM scoped limit; 160 is +2% at 1080p but -14%
    at 512^2 (ragged last tile).  Callers that know their lane count pass
    it to get the shape-aware default: 160 only where it was the measured
    winner (>=1.5M lanes), 128 otherwise."""
    import os

    env = os.environ.get("PT_TPU_MEGA_ROWS")
    if env:
        return int(env)
    if nlanes is not None and nlanes >= 1_500_000:
        return 160
    return 128


def tile_rows(stream: bool, tex: bool = False, nt: int = 0) -> int:
    """Ray-tile rows for the standalone nearest/blocker kernels.  Measured
    on the 249k-tri streamed mesh at 1080p (sorted secondary rays): 32 rows
    766 ms, 64 rows 855 ms, 128 rows 1190 ms — unlike the megakernel
    (VMEM tables, where 128 beat 32 by 1.5x), the streamed sweep is
    dominated by tile-level culling selectivity, and a wider tile's union
    frustum passes more clusters than the amortized scalar/DMA overhead
    saves.  32 stays the general default; the env knobs exist for
    re-sweeps.

    ``tex``: the textured fused tier (with_uv nearest + tex shade) runs
    64-row tiles — round-4 hardware A/B on the 81,920-tri textured
    icosphere at 1080p spp16: 32 rows 1.178, 64 rows 1.332 (+13%), 128
    rows 1.306 Mpaths/s (the VMEM sweep amortizes its sequential
    cluster/vertex loops over more lanes; 128 tips the VMEM budget).
    The PPM eye pass measured the OPPOSITE (128 rows 1.312 vs 32-row
    1.632 Mphotons/s on config4), so the wider tile stays tex-only.

    ``nt``: triangle count of the VMEM table, for the budget guard — the
    64-row tex default was validated at 81,920 tris; near the 131,072-tri
    VMEM ceiling the doubled ray tiles plus the 31-col with_uv table risk
    the scoped-VMEM limit (ADVICE r4 item 3), so >100k tris falls back to
    32 rows (mirroring pallas_photon's budget guard).  The env override
    still wins for A/B sweeps."""
    import os

    if stream:
        return int(os.environ.get("PT_TPU_STREAM_TILE_ROWS", "32"))
    default = "64" if tex and nt <= 100_000 else ("32" if tex else
                                                  str(TILE_ROWS))
    return int(os.environ.get("PT_TPU_TILE_ROWS", default))


def max_vmem_tris() -> int:
    """Above this the triangle table leaves VMEM and the streaming kernels
    take over (249k tris overflow the 128M VMEM budget; 131072 rows of 31
    cols is ~16M and leaves room for the ray tiles)."""
    import os

    return int(os.environ.get("PT_TPU_MAX_VMEM_TRIS", "131072"))


# ---------------------------------------------------------------------------
# scene packing
# ---------------------------------------------------------------------------

def pack_scene(scene: Scene, with_uv: bool = False):
    """Traceable packing of the primitive tables (runs under jit; XLA hoists
    it out of scan bodies as loop-invariant).  Returns (sph_tab (Ms,8),
    tri_tab (Mt,16), ns, nl, nt); sphere rows are [spheres..., light balls...].

    ``with_uv`` appends per-triangle vertex UVs (cols 24-29) and the texture
    id (col 30) so the nearest-hit kernel can interpolate texture coordinates
    in-register (textured OBJ scenes, ops/texture.py).

    Meshes beyond the VMEM ceiling use ``pack_scene_stream_vpu`` instead.
    """
    ns, nl, nt = scene.num_spheres, scene.num_lights, scene.num_triangles
    s_rows = ns + nl
    ms = max(SUB, ((s_rows + SUB - 1) // SUB) * SUB)
    mt = max(SUB, ((nt + SUB - 1) // SUB) * SUB)

    def rowpad(x, rows):
        return jnp.concatenate(
            [x, jnp.zeros((rows - x.shape[0],) + x.shape[1:], x.dtype)], 0)

    ones_s = jnp.ones((ns, 1))

    def mtl_cols(m, n, is_light):
        # [bc r g b, roughness, metallic, eta, is_light]
        if is_light:
            # CPU-oracle light-ball material (cpu_bdpt.cpp:69-72)
            return jnp.concatenate([
                scene.light_illum, jnp.ones((n, 1)), jnp.zeros((n, 2)),
                jnp.ones((n, 1))], axis=1)
        return jnp.concatenate([
            m.base_color, m.roughness[:, None], m.metallic[:, None],
            m.eta[:, None], jnp.zeros((n, 1))], axis=1)

    # columns 0-7: geometry+flags, 8-14: material, 15: is_light
    sph_rows = jnp.concatenate([
        jnp.concatenate([
            scene.sph_center, scene.sph_radius[:, None], ones_s,
            (scene.sph_mtl.eta <= 0.0).astype(jnp.float32)[:, None],
            jnp.zeros((ns, 2)), mtl_cols(scene.sph_mtl, ns, False),
            jnp.zeros((ns, 1))], axis=1),
        # light balls: valid nearest-hit targets, never block shadow rays
        jnp.concatenate([
            scene.light_pos, scene.light_ball_r[:, None],
            jnp.zeros((nl, 4)), mtl_cols(None, nl, True),
            jnp.zeros((nl, 1))], axis=1),
    ], axis=0)
    sph = rowpad(sph_rows, ms)  # padded rows keep r=0 -> never hit

    # columns 0-8: vertices, 9-10: block flags, 11: pad, then
    # 12-14: geometric normal (precomputed), 16-22: material
    tn = scene.tri_v1 - scene.tri_v0
    tn = jnp.cross(tn, scene.tri_v2 - scene.tri_v0)
    tn = tn / jnp.maximum(
        jnp.sqrt(jnp.sum(tn * tn, axis=-1, keepdims=True)), 1e-20)
    tri_cols = [
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        jnp.ones((nt, 1)),
        (scene.tri_mtl.eta <= 0.0).astype(jnp.float32)[:, None],
        jnp.zeros((nt, 1)), tn, jnp.zeros((nt, 1)),
        mtl_cols(scene.tri_mtl, nt, False), jnp.zeros((nt, 1))]
    if with_uv:
        uv6 = (scene.tri_uv if scene.tri_uv.shape[0] == nt
               else jnp.zeros((nt, 6)))
        tex = (scene.tri_tex.astype(jnp.float32)[:, None]
               if scene.tri_tex.shape[0] == nt
               else jnp.full((nt, 1), -1.0))
        tri_cols += [uv6, tex]
    tri_rows = jnp.concatenate(tri_cols, axis=1)
    tri = rowpad(tri_rows, mt)

    # cluster table rows: [min3, max3, start, count] (start/count as f32;
    # exact below 2^24).  Single all-covering cluster when unset.
    cl = jnp.concatenate([
        scene.tri_cluster_aabb,
        scene.tri_cluster_range.astype(jnp.float32)], axis=1)
    mc = max(SUB, ((cl.shape[0] + SUB - 1) // SUB) * SUB)
    cl = rowpad(cl, mc)  # padded rows have count=0 -> skipped
    return sph, tri, cl, ns, nl, nt


def _stream_layout(scene: Scene):
    """Shared padded-index layout for the streaming packings: every
    cluster's triangles re-scatter to a TB-aligned ``padded_start`` so a
    cluster is a whole number of 32-triangle blocks in EITHER table form.
    Returns (sph, ns, nl, nt, dest, Tp, attr_tab, vert_tab, cl_tab)."""
    sph, _, _, ns, nl, nt = pack_scene(scene)

    starts = scene.tri_cluster_range[:, 0].astype(jnp.int32)
    counts = scene.tri_cluster_range[:, 1].astype(jnp.int32)
    mc0 = starts.shape[0]
    nblk_c = (counts + TB - 1) // TB
    padded_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nblk_c * TB)[:-1]])
    # static padded size: every cluster wastes < TB rows
    Tp = ((nt + TB * mc0 + TB - 1) // TB) * TB

    # per-triangle destination in padded space
    i = jnp.arange(nt, dtype=jnp.int32)
    cid = jnp.searchsorted(starts, i, side="right").astype(jnp.int32) - 1
    dest = padded_start[cid] + (i - starts[cid])

    e1 = scene.tri_v1 - scene.tri_v0
    e2 = scene.tri_v2 - scene.tri_v0
    n = jnp.cross(e1, e2)
    nn = n / jnp.maximum(
        jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True)), 1e-20)
    m = scene.tri_mtl
    uv6 = (scene.tri_uv if scene.tri_uv.shape[0] == nt
           else jnp.zeros((nt, 6)))
    tex = (scene.tri_tex.astype(jnp.float32)[:, None]
           if scene.tri_tex.shape[0] == nt else jnp.full((nt, 1), -1.0))
    attr_rows = jnp.concatenate(
        [nn, m.base_color, m.roughness[:, None], m.metallic[:, None],
         m.eta[:, None], uv6, tex], axis=1)                      # (nt,16)
    attr_tab = jnp.zeros((Tp, 16)).at[dest].set(attr_rows)
    vert_tab = jnp.zeros((Tp, 9)).at[dest].set(
        jnp.concatenate([scene.tri_v0, scene.tri_v1, scene.tri_v2], axis=1))

    # per-32-triangle-BLOCK AABBs (round 3): the streamed sweep bisect
    # measured triangle math at 67% of a pass with tile-level selectivity
    # saturated (sub-tiles, dir-bits, leaf sizes, tile heights all lost) —
    # the remaining selectivity lives INSIDE a cluster's chunk, where one
    # slab test per 32-triangle block can skip 4 rows x 8 slots of
    # Moller-Trumbore.  Rows [min3, max3, pad2]; empty (padding) blocks
    # keep the +-1e30 sentinels and never pass the slab test.
    NB = Tp // TB
    blk_id = dest // TB
    vmin = jnp.minimum(jnp.minimum(scene.tri_v0, scene.tri_v1),
                       scene.tri_v2)
    vmax = jnp.maximum(jnp.maximum(scene.tri_v0, scene.tri_v1),
                       scene.tri_v2)
    bmin = jnp.full((NB, 3), 1e30).at[blk_id].min(vmin)
    bmax = jnp.full((NB, 3), -1e30).at[blk_id].max(vmax)
    nb_pad = (-NB) % SUB
    blk_tab = jnp.concatenate([bmin, bmax, jnp.zeros((NB, 2))], axis=1)
    blk_tab = jnp.concatenate(
        [blk_tab, jnp.broadcast_to(
            jnp.asarray([1e30] * 3 + [-1e30] * 3 + [0.0, 0.0]),
            (nb_pad, 8))], axis=0)

    cl = jnp.concatenate([
        scene.tri_cluster_aabb,
        padded_start.astype(jnp.float32)[:, None],
        counts.astype(jnp.float32)[:, None]], axis=1)
    mc = max(SUB, ((mc0 + SUB - 1) // SUB) * SUB)
    cl = jnp.concatenate(
        [cl, jnp.zeros((mc - mc0, 8), cl.dtype)], 0)
    return sph, ns, nl, nt, dest, Tp, attr_tab, vert_tab, cl, blk_tab


def _stream_can_block(scene: Scene, dielectrics_block: bool | None):
    nt = scene.num_triangles
    if dielectrics_block is None or dielectrics_block:
        return jnp.ones((nt, 1))  # GPU rule: everything blocks
    return (scene.tri_mtl.eta <= 0.0).astype(jnp.float32)[:, None]


def pack_scene_stream_vpu(scene: Scene,
                          dielectrics_block: bool | None = None):
    """Packing for the HBM-streaming kernels (meshes beyond the VMEM
    ceiling): 8 slots of 16 lanes per row, slot = ``[v0(3), e1(3), e2(3),
    can_block, pad(6)]`` with the edges precomputed at pack time (same f32
    subtraction the VMEM kernel's ``_mt_core`` performs in-register, so
    u/v/t stay bit-identical).  A 32-triangle block is
    ``VPU_ROWS_PER_BLK`` = 4 rows; padding slots are all-zero (e1 = e2 = 0
    -> determinant 0 -> parallel -> never hit).

    Returns (sph_tab, v_tab, attr_tab, vert_tab, cl_tab, ns, nl, nt):

    - ``attr_tab`` (Tp, 16): winner attributes in PADDED index space
      ``[n^(3), base_color(3), rough, metal, eta, uv6(6), tex]`` — the
      kernel returns (t, idx) and ONE XLA row-gather resolves these
      outside (the in-kernel per-triangle attribute selects it replaces
      cost ~25% of the sweep).
    - ``vert_tab`` (Tp, 9): raw v0,v1,v2 in padded space, used by the
      with_uv wrappers to recompute the winner's barycentrics in XLA.
    - ``cl_tab`` rows: [min3, max3, padded_start, count] (f32; exact below
      2^24 triangles).

    ``dielectrics_block`` (for the blocker): True = every surface blocks,
    the GPU ``check_visibility`` rule (geometric.cuh:293-325 with Ks=0);
    False = dielectrics pass, the CPU-oracle rule (matching
    ``ops.intersect.transmittance``).  The flag rides in slot lane 9."""
    (sph, ns, nl, nt, dest, Tp, attr_tab, vert_tab, cl,
     blk_tab) = _stream_layout(scene)

    v0 = scene.tri_v0
    e1 = scene.tri_v1 - v0
    e2 = scene.tri_v2 - v0
    can_block = _stream_can_block(scene, dielectrics_block)
    slot = jnp.concatenate(
        [v0, e1, e2, can_block, jnp.zeros((nt, VPU_SLOT - 10))], axis=1)
    S = jnp.zeros((Tp, VPU_SLOT)).at[dest].set(slot)
    v_tab = S.reshape(Tp // VPU_TPR, 128)
    v_tab = jnp.concatenate(
        [v_tab, jnp.zeros((VPU_WINDOW, 128), v_tab.dtype)], 0)
    return sph, v_tab, attr_tab, vert_tab, cl, ns, nl, nt, blk_tab


def super_table(cl_tab: jnp.ndarray):
    """(cl_tab padded to a SUPER multiple + child orders, sup_tab (NS, 16),
    use_super).

    Super rows are ``[union_min3, union_max3, 0, child_tri_count,
    order_oct0..order_oct7]`` over SUPER consecutive cluster rows; count-0
    (padded) children contribute sentinel bounds that never pass the slab
    test.  Columns 8..15 hold eight front-to-back traversal permutations
    of the super indices, one per ray-direction octant (sorted by the
    centroid's projection on (+-1,+-1,+-1); empty supers sort last).  The
    kernels pick the tile's order from its lane-0 direction — visiting
    near supers first shrinks the per-lane ``best.t`` early so the
    ``tn < tlimit`` slab cull rejects the far ones (traversal order never
    changes which hit wins: ``keep`` takes strictly-closer only).

    The returned cl_tab likewise grows columns 8..15: the k-th row of a
    super's run holds, per octant, the RELATIVE index (0..SUPER-1) of the
    k-th child in that octant's front-to-back order — the same early-t
    shrink one level down, where a descended super's 16 children each pay
    a whole-window triangle sweep if not culled.

    ``use_super`` is static (shape-derived) so small scenes keep the flat
    loop."""
    mc = cl_tab.shape[0]
    use_super = mc >= SUPER_MIN_CLUSTERS
    if not use_super:
        return cl_tab, jnp.zeros((SUB, 16), jnp.float32), False
    pad = (-mc) % SUPER
    if pad:
        cl_tab = jnp.concatenate(
            [cl_tab, jnp.zeros((pad, 8), cl_tab.dtype)], 0)
    g = cl_tab.shape[0] // SUPER
    valid = cl_tab[:, 7:8] > 0
    mins = jnp.where(valid, cl_tab[:, 0:3], 1e30)
    maxs = jnp.where(valid, cl_tab[:, 3:6], -1e30)
    smin = mins.reshape(g, SUPER, 3).min(axis=1)
    smax = maxs.reshape(g, SUPER, 3).max(axis=1)
    scnt = cl_tab[:, 7].reshape(g, SUPER).sum(axis=1, keepdims=True)
    sup = jnp.concatenate(
        [smin, smax, jnp.zeros((g, 1), cl_tab.dtype), scnt], axis=1)
    gp = (-g) % SUB
    if gp:
        sup = jnp.concatenate([sup, jnp.zeros((gp, 8), sup.dtype)], 0)

    def octant_orders(ctr, alive):
        """Eight argsort columns of centroid projections (f32; exact)."""
        orders = []
        for o in range(8):
            d = jnp.array([1.0 if o & 1 else -1.0,
                           1.0 if o & 2 else -1.0,
                           1.0 if o & 4 else -1.0], jnp.float32)
            proj = jnp.where(alive, ctr @ d, jnp.float32(3e30))
            orders.append(jnp.argsort(proj, axis=-1).astype(jnp.float32))
        return jnp.stack(orders, axis=-1)       # (..., 8)

    sup = jnp.concatenate(
        [sup, octant_orders((sup[:, 0:3] + sup[:, 3:6]) * 0.5,
                            sup[:, 7] > 0)], axis=1)

    # per-super child orders: (g, SUPER, 8) relative indices
    cctr = ((cl_tab[:, 0:3] + cl_tab[:, 3:6]) * 0.5).reshape(g, SUPER, 3)
    calive = (cl_tab[:, 7] > 0).reshape(g, SUPER)
    corder = octant_orders(cctr, calive)
    cl_tab = jnp.concatenate([cl_tab, corder.reshape(-1, 8)], axis=1)
    return cl_tab, sup, True


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _mt_core(read, rox, roy, roz, rdx, rdy, rdz):
    """Raw Moller-Trumbore evaluation against one table row (``read(col)``
    abstracts VMEM-row vs streamed-scratch access).  Returns
    (base_ok, u, v, t) with the shared determinant window / barycentric /
    t > EPSILON gates; callers add their own distance/flag gates on top —
    keeping ONE copy of the math guarantees shadow rays and primary rays
    agree bit-for-bit."""
    v0x, v0y, v0z = read(0), read(1), read(2)
    e1 = (read(3) - v0x, read(4) - v0y, read(5) - v0z)
    e2 = (read(6) - v0x, read(7) - v0y, read(8) - v0z)
    return _mt_from_edges((v0x, v0y, v0z), e1, e2,
                          rox, roy, roz, rdx, rdy, rdz, EPSILON)


def _mt_from_edges(v0, e1, e2, rox, roy, roz, rdx, rdy, rdz, t_gate_lo):
    """The edges-onward Moller-Trumbore body — the SINGLE copy shared by
    ``_mt_core`` (VMEM tables, edges from vertex columns) and
    ``_vpu_slot_eval`` (streamed slot tables, edges precomputed at pack
    time with the same f32 subtraction), which is what guarantees their
    u/v/t agree bit-for-bit."""
    v0x, v0y, v0z = v0
    e1x, e1y, e1z = e1
    e2x, e2y, e2z = e2
    hx = rdy * e2z - rdz * e2y
    hy = rdz * e2x - rdx * e2z
    hz = rdx * e2y - rdy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    parallel = (a > -1e-6) & (a < 1e-6)
    f = 1.0 / jnp.where(parallel, 1.0, a)
    sx, sy, sz = rox - v0x, roy - v0y, roz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (rdx * qx + rdy * qy + rdz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    ok = (~parallel & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > t_gate_lo))
    return ok, u, v, t


def _make_tri_test(rox, roy, roz, rdx, rdy, rdz, keep, with_uv):
    """Shared nearest-hit triangle test (attribute keep on top of
    ``_mt_core``); ``extra_ok`` masks slot over-fetch in stream mode."""

    def tri_test(best, read, extra_ok=None):
        ok, u, v, t = _mt_core(read, rox, roy, roz, rdx, rdy, rdz)
        if extra_ok is not None:
            ok &= extra_ok
        t = jnp.where(ok, t, INF)
        closer = t < best["t"]
        nx = jnp.broadcast_to(read(12), rox.shape)
        ny = jnp.broadcast_to(read(13), rox.shape)
        nz = jnp.broadcast_to(read(14), rox.shape)
        row = [read(16 + j) for j in range(6)]
        uvt = None
        if with_uv:
            # uv6 at cols 24-29, tex at col 30 (the base row is 24 wide:
            # 9 verts + 3 flags + 3 normal + pad + 7 mtl + pad)
            w0 = 1.0 - u - v
            iu = w0 * read(24) + u * read(26) + v * read(28)
            iv = w0 * read(25) + u * read(27) + v * read(29)
            uvt = (iu, iv, jnp.broadcast_to(read(30), rox.shape))
        return keep(best, closer, t, nx, ny, nz, row,
                    jnp.ones((), jnp.int32), uvt)

    return tri_test


def _nearest_kernel(sph_ref, tri_ref, cl_ref, sup_ref, *args, ns, nl, nt,
                    with_uv=False, use_super=False, sr=None, compact=False):
    """Nearest hit + in-kernel attribute resolution (VMEM-resident tables;
    big meshes go through ``_nearest_stream_kernel_vpu``).

    Carrying the winning primitive's normal/material through the loop
    avoids (B,) HBM gathers afterwards (they cost more than the whole
    intersection sweep at VMEM scene sizes).  flags_out: 0 = miss,
    1 = surface, 2 = light ball.  ``with_uv`` additionally interpolates the
    winning triangle's vertex UVs from its Moller-Trumbore barycentrics and
    carries the texture id (outputs iu, iv, tex appended) — the texture
    FETCH stays outside (per-lane atlas gathers don't exist in Mosaic; the
    host does one batched XLA gather instead, ops/texture.py).

    ``sr``: sub-tile height for the cluster walk — mesh scenes (cluster
    count >= 16, decided by the wrapper) run the whole triangle traversal
    once per ``sr``-row window so the slab cull tests each window against
    ITS OWN best-t and windows that can't improve skip the sweep.

    ``compact``: an SMEM ``(1, 1)`` ``n_live`` scalar precedes the ray
    refs; tiles wholly past the (dead-last sorted) live boundary write
    miss defaults and skip every sweep (see ``_sorted_call``).
    """
    if compact:
        nlive_ref = args[0]
        args = args[1:]
    ox, oy, oz, dx, dy, dz = args[:6]
    (t_out, nx_out, ny_out, nz_out, bcr_out, bcg_out, bcb_out, rough_out,
     metal_out, eta_out, flags_out) = args[6:17]
    uv_outs = args[17:]
    rows = ox.shape[0]
    sr = sr or rows
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]

    if compact:
        live_tile = pl.program_id(0) * rows * LANE < nlive_ref[0, 0]

        @pl.when(~live_tile)
        def _():
            zf = jnp.zeros(rox.shape, jnp.float32)
            t_out[...] = zf + INF
            for ref in (nx_out, ny_out, nz_out, bcr_out, bcg_out, bcb_out,
                        rough_out, metal_out, eta_out):
                ref[...] = zf
            flags_out[...] = jnp.zeros(rox.shape, jnp.int32)
            if with_uv:
                iu_o, iv_o, tex_o = uv_outs
                iu_o[...] = zf
                iv_o[...] = zf
                tex_o[...] = zf - 1.0

        @pl.when(live_tile)
        def _():
            _nearest_vmem_body(
                sph_ref, tri_ref, cl_ref, sup_ref,
                rox, roy, roz, rdx, rdy, rdz, dx, dy, dz,
                t_out, nx_out, ny_out, nz_out, bcr_out, bcg_out, bcb_out,
                rough_out, metal_out, eta_out, flags_out, uv_outs,
                ns=ns, nl=nl, with_uv=with_uv, use_super=use_super,
                rows=rows, sr=sr)
        return
    _nearest_vmem_body(
        sph_ref, tri_ref, cl_ref, sup_ref,
        rox, roy, roz, rdx, rdy, rdz, dx, dy, dz,
        t_out, nx_out, ny_out, nz_out, bcr_out, bcg_out, bcb_out,
        rough_out, metal_out, eta_out, flags_out, uv_outs,
        ns=ns, nl=nl, with_uv=with_uv, use_super=use_super,
        rows=rows, sr=sr)


def _nearest_vmem_body(sph_ref, tri_ref, cl_ref, sup_ref,
                       rox, roy, roz, rdx, rdy, rdz, dx, dy, dz,
                       t_out, nx_out, ny_out, nz_out, bcr_out, bcg_out,
                       bcb_out, rough_out, metal_out, eta_out, flags_out,
                       uv_outs, *, ns, nl, with_uv, use_super, rows, sr):

    f0 = jnp.zeros(rox.shape, jnp.float32)
    best = dict(t=jnp.full(rox.shape, INF, jnp.float32),
                nx=f0, ny=f0, nz=f0, bcr=f0, bcg=f0, bcb=f0,
                rough=f0, metal=f0, eta=f0, flag=jnp.zeros(rox.shape,
                                                           jnp.int32))
    if with_uv:
        best.update(iu=f0, iv=f0, tex=f0 - 1.0)

    def make_keep(z0):
        def keep(best, closer, t, nx, ny, nz, row_mtl, flag, uvt=None):
            sel = lambda a, b: jnp.where(closer, a, b)
            out = dict(
                t=sel(t, best["t"]),
                nx=sel(nx, best["nx"]), ny=sel(ny, best["ny"]),
                nz=sel(nz, best["nz"]),
                bcr=sel(row_mtl[0], best["bcr"]), bcg=sel(row_mtl[1],
                                                          best["bcg"]),
                bcb=sel(row_mtl[2], best["bcb"]),
                rough=sel(row_mtl[3], best["rough"]),
                metal=sel(row_mtl[4], best["metal"]),
                eta=sel(row_mtl[5], best["eta"]),
                flag=jnp.where(closer, flag, best["flag"]),
            )
            if with_uv:
                iu, iv, tex = uvt if uvt is not None else (z0, z0, z0 - 1.0)
                out.update(iu=sel(iu, best["iu"]), iv=sel(iv, best["iv"]),
                           tex=sel(tex, best["tex"]))
            return out

        return keep

    keep_full = make_keep(f0)

    # spheres then light balls (geometric.cuh:240-259, order = tie-break)
    def sph_body(i, best):
        cx = sph_ref[i, 0]; cy = sph_ref[i, 1]; cz = sph_ref[i, 2]
        r = sph_ref[i, 3]
        ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
        b = ocx * rdx + ocy * rdy + ocz * rdz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        h = b * b - c
        sh = jnp.sqrt(jnp.maximum(h, 0.0))
        t1 = -b - sh
        t2 = -b + sh
        ok = (h >= 0.0) & (r > 0.0)
        v1 = ok & (t1 > EPSILON)
        v2 = ok & (t2 > EPSILON)
        t = jnp.where(v1, t1, jnp.where(v2, t2, INF))
        closer = t < best["t"]
        inv_r = 1.0 / jnp.maximum(r, 1e-20)
        nx = (ocx + rdx * t) * inv_r
        ny = (ocy + rdy * t) * inv_r
        nz = (ocz + rdz * t) * inv_r
        row = [sph_ref[i, 8 + j] for j in range(6)]
        flag = jnp.where(sph_ref[i, 14] > 0.0, 2, 1)
        return keep_full(best, closer, t, nx, ny, nz, row, flag)

    best = jax.lax.fori_loop(0, ns + nl, sph_body, best)

    n_clusters = cl_ref.shape[0]
    o_idx = _tile_octant(dx, dy, dz)

    def walk(best, wx, wy, wz, wdx, wdy, wdz):
        """Cluster/super traversal over one row window's state."""
        invx, invy, invz = _safe_inv3(wdx, wdy, wdz)
        keep = make_keep(jnp.zeros_like(wx))
        tri_test = _make_tri_test(wx, wy, wz, wdx, wdy, wdz, keep, with_uv)

        def tri_body(i, best):
            return tri_test(best, lambda col: tri_ref[i, col])

        def aabb_hit(ref, c, tlimit):
            t0x = (ref[c, 0] - wx) * invx
            t1x = (ref[c, 3] - wx) * invx
            t0y = (ref[c, 1] - wy) * invy
            t1y = (ref[c, 4] - wy) * invy
            t0z = (ref[c, 2] - wz) * invz
            t1z = (ref[c, 5] - wz) * invz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), EPSILON))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            return (tn <= tf) & (tn < tlimit)

        def cluster_body(c, best):
            could_hit = aabb_hit(cl_ref, c, best["t"])
            start = cl_ref[c, 6].astype(jnp.int32)
            count = cl_ref[c, 7].astype(jnp.int32)

            def run(best):
                return jax.lax.fori_loop(start, start + count, tri_body,
                                         best)

            return jax.lax.cond(jnp.any(could_hit) & (count > 0), run,
                                lambda b: b, best)

        if use_super:
            def perm(si):
                """si-th super in this tile's front-to-back octant order."""
                return _octant_perm(sup_ref, o_idx, si)

            def child_perm(row):
                """Relative index of the k-th child (row = base + k) in
                this tile's front-to-back octant order (cl cols 8..15)."""
                return _octant_perm(cl_ref, o_idx, row)

            def super_body(si, best):
                s = perm(si)
                could = aabb_hit(sup_ref, s, best["t"])
                cnt = sup_ref[s, 7].astype(jnp.int32)

                def descend(b):
                    # children front-to-back too: near hits shrink best.t
                    # before the far children's slab tests
                    def kbody(k, b):
                        return cluster_body(
                            s * SUPER + child_perm(s * SUPER + k), b)

                    return jax.lax.fori_loop(0, SUPER, kbody, b)

                return jax.lax.cond(jnp.any(could) & (cnt > 0), descend,
                                    lambda b: b, best)

            return jax.lax.fori_loop(0, n_clusters // SUPER, super_body,
                                     best)
        return jax.lax.fori_loop(0, n_clusters, cluster_body, best)

    if sr == rows:
        best = walk(best, rox, roy, roz, rdx, rdy, rdz)
    else:
        parts = []
        for st in range(rows // sr):
            r0 = st * sr
            w = slice(r0, r0 + sr)
            parts.append(walk(
                {k: v[w] for k, v in best.items()},
                rox[w], roy[w], roz[w], rdx[w], rdy[w], rdz[w]))
        best = {k: jnp.concatenate([p[k] for p in parts], axis=0)
                for k in best}

    # flip the normal toward the ray (geometric.cuh:350,365,383)
    ndotd = best["nx"] * rdx + best["ny"] * rdy + best["nz"] * rdz
    sgn = jnp.where(ndotd > 0.0, -1.0, 1.0)

    t_out[...] = best["t"]
    nx_out[...] = best["nx"] * sgn
    ny_out[...] = best["ny"] * sgn
    nz_out[...] = best["nz"] * sgn
    bcr_out[...] = best["bcr"]
    bcg_out[...] = best["bcg"]
    bcb_out[...] = best["bcb"]
    rough_out[...] = best["rough"]
    metal_out[...] = best["metal"]
    eta_out[...] = best["eta"]
    flags_out[...] = best["flag"] * (best["t"] < INF).astype(jnp.int32)
    if with_uv:
        iu_out, iv_out, tex_out = uv_outs
        iu_out[...] = best["iu"]
        iv_out[...] = best["iv"]
        tex_out[...] = best["tex"]


def _blocker_kernel(sph_ref, tri_ref, cl_ref, sup_ref, *args, ns, nl, nt,
                    blocks_col, use_super=False, sr=None, compact=False):
    """any-hit in (1e-3, maxd) honoring the per-prim blocks flag
    (VMEM-resident tables; big meshes go through
    ``_blocker_stream_kernel_vpu``).  Light balls are excluded by their
    blocks flag being 0.  ``sr``: sub-tile height for the cluster walk
    (see ``_nearest_kernel``); ``compact``: dead-lane tiles write 0
    (unblocked) and skip every sweep (see ``_sorted_call``)."""
    if compact:
        nlive_ref = args[0]
        args = args[1:]
    ox, oy, oz, dx, dy, dz, maxd, blocked_out = args
    rows = ox.shape[0]
    sr = sr or rows
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    md = maxd[...]
    if compact:
        live_tile = pl.program_id(0) * rows * LANE < nlive_ref[0, 0]

        @pl.when(~live_tile)
        def _():
            blocked_out[...] = jnp.zeros(rox.shape, jnp.int32)

        @pl.when(live_tile)
        def _():
            _blocker_vmem_body(
                sph_ref, tri_ref, cl_ref, sup_ref,
                rox, roy, roz, rdx, rdy, rdz, dx, dy, dz, md, blocked_out,
                ns=ns, nl=nl, blocks_col=blocks_col, use_super=use_super,
                rows=rows, sr=sr)
        return
    _blocker_vmem_body(
        sph_ref, tri_ref, cl_ref, sup_ref,
        rox, roy, roz, rdx, rdy, rdz, dx, dy, dz, md, blocked_out,
        ns=ns, nl=nl, blocks_col=blocks_col, use_super=use_super,
        rows=rows, sr=sr)


def _blocker_vmem_body(sph_ref, tri_ref, cl_ref, sup_ref,
                       rox, roy, roz, rdx, rdy, rdz, dx, dy, dz, md,
                       blocked_out, *, ns, nl, blocks_col, use_super,
                       rows, sr):
    MIN_D = 1e-3

    # NB: carry int32, not bool — Mosaic miscompiles i1 vector loop carries
    blocked = jnp.zeros(rox.shape, jnp.int32)

    def sph_body(i, blocked):
        cx = sph_ref[i, 0]; cy = sph_ref[i, 1]; cz = sph_ref[i, 2]
        r = sph_ref[i, 3]
        can_block = sph_ref[i, blocks_col]
        ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
        b = ocx * rdx + ocy * rdy + ocz * rdz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        h = b * b - c
        sh = jnp.sqrt(jnp.maximum(h, 0.0))
        t1 = -b - sh
        t2 = -b + sh
        ok = (h >= 0.0) & (r > 0.0) & (can_block > 0.0)
        v1 = ok & (t1 > EPSILON) & (t1 < md)
        v2 = ok & (t2 > EPSILON) & (t2 < md)
        t = jnp.where(v1, t1, jnp.where(v2, t2, INF))
        return blocked | ((t < INF) & (t > MIN_D)).astype(jnp.int32)

    # light-ball rows (ns..ns+nl) carry hard-zero block flags — skip them
    blocked = jax.lax.fori_loop(0, ns, sph_body, blocked)

    o_idx = _tile_octant(dx, dy, dz)

    def walk(blocked, wx, wy, wz, wdx, wdy, wdz, wmd):
        invx, invy, invz = _safe_inv3(wdx, wdy, wdz)

        def tri_shadow(blocked, read, extra_ok=None):
            ok, _, _, t = _mt_core(read, wx, wy, wz, wdx, wdy, wdz)
            can_block = read(blocks_col + 5)  # tri flags live at cols 9/10
            ok &= (t < wmd) & (can_block > 0.0)
            if extra_ok is not None:
                ok &= extra_ok
            return blocked | (ok & (t > MIN_D)).astype(jnp.int32)

        def tri_body(i, blocked):
            return tri_shadow(blocked, lambda col: tri_ref[i, col])

        def aabb_hit(ref, c, blocked):
            t0x = (ref[c, 0] - wx) * invx
            t1x = (ref[c, 3] - wx) * invx
            t0y = (ref[c, 1] - wy) * invy
            t1y = (ref[c, 4] - wy) * invy
            t0z = (ref[c, 2] - wz) * invz
            t1z = (ref[c, 5] - wz) * invz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), MIN_D))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            return (tn <= tf) & (tn < wmd) & (blocked == 0)

        def cluster_body(c, blocked):
            could_hit = aabb_hit(cl_ref, c, blocked)
            start = cl_ref[c, 6].astype(jnp.int32)
            count = cl_ref[c, 7].astype(jnp.int32)

            def run(blocked):
                return jax.lax.fori_loop(start, start + count, tri_body,
                                         blocked)

            return jax.lax.cond(jnp.any(could_hit) & (count > 0), run,
                                lambda b: b, blocked)

        if use_super:
            # near-first traversal (same order machinery as
            # _nearest_kernel): any-hit has no shrinking t, but blockers
            # near the origin are the common case and a fully-blocked
            # window skips every later super via the ``blocked == 0`` term
            def perm(si):
                return _octant_perm(sup_ref, o_idx, si)

            def super_body(si, blocked):
                s = perm(si)
                could = aabb_hit(sup_ref, s, blocked)
                cnt = sup_ref[s, 7].astype(jnp.int32)

                def descend(b):
                    return jax.lax.fori_loop(s * SUPER, (s + 1) * SUPER,
                                             cluster_body, b)

                return jax.lax.cond(jnp.any(could) & (cnt > 0), descend,
                                    lambda b: b, blocked)

            return jax.lax.fori_loop(0, cl_ref.shape[0] // SUPER,
                                     super_body, blocked)
        return jax.lax.fori_loop(0, cl_ref.shape[0], cluster_body, blocked)

    if sr == rows:
        blocked = walk(blocked, rox, roy, roz, rdx, rdy, rdz, md)
    else:
        parts = []
        for st in range(rows // sr):
            w = slice(st * sr, st * sr + sr)
            parts.append(walk(blocked[w], rox[w], roy[w], roz[w],
                              rdx[w], rdy[w], rdz[w], md[w]))
        blocked = jnp.concatenate(parts, axis=0)
    blocked_out[...] = blocked


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _tile(x, rows):
    """(B,) -> padded (rows_total, 128)."""
    b = x.shape[0]
    per = rows * LANE
    pad = (-b) % per
    x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x.reshape(-1, LANE), pad


def _ray_specs(n, rows=TILE_ROWS):
    return [pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(n)]


def _stream_mode(nt: int, force_stream: bool) -> bool:
    return force_stream or nt > max_vmem_tris()


def _stream_scratch(window_rows: int = VPU_WINDOW):
    """Triangle-window scratch + DMA semaphores for the streaming kernels:
    slots 0/1 double-buffer across a super's children, slot 2 serves the
    flat path and straddling extra chunks."""
    return [pltpu.VMEM((3, window_rows, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3,))]


def _stream_traverse(cl_ref, sup_ref, a_hbm, tri_vmem, dma_sem, could_hit,
                     process_chunk, use_super, o_idx,
                     rows_per_blk=VPU_ROWS_PER_BLK):
    """Shared cluster walk for the streaming kernels: 2-level culling +
    per-cluster DMA of (window_rows, 128) slot-table windows,
    double-buffered across a descended super's children (slots 0/1; slot 2
    serves the flat path and rare straddling chunks).  ``could_hit(ref,
    c)`` reads the kernel's live state from its output refs;
    ``process_chunk(sl, nb, base, c, z)`` sweeps ``nb`` blocks of
    ``rows_per_blk`` rows from VMEM slot ``sl``
    (first padded triangle index ``base``) — handing the kernel a whole
    chunk lets it keep its ray loop OUTER and carry best-hit state in
    registers across the chunk's blocks (one output-ref RMW per chunk
    instead of per block).  Over-fetch past a cluster's last block needs
    no masking: intra-block padding rows are all-zero (a == 0 -> parallel
    -> never hit) and trailing blocks hold the NEXT cluster's real
    triangles, whose extra tests are idempotent for both nearest-hit and
    any-hit."""
    window_rows = tri_vmem.shape[1]
    BPC = window_rows // rows_per_blk   # blocks per DMA chunk

    def cl_dma(slot, c):
        row0 = (cl_ref[c, 6].astype(jnp.int32) // TB) * rows_per_blk
        return pltpu.make_async_copy(
            a_hbm.at[pl.ds(row0, window_rows)], tri_vmem.at[slot],
            dma_sem.at[slot])

    def process_cluster(c, slot, z):
        pstart = cl_ref[c, 6].astype(jnp.int32)
        count = cl_ref[c, 7].astype(jnp.int32)
        nblk = (count + TB - 1) // TB
        n_chunks = (nblk + BPC - 1) // BPC

        def chunk_from(sl, ch, z):
            nb = jnp.minimum(nblk - ch * BPC, BPC)
            return process_chunk(sl, nb, pstart + ch * BPC * TB, c, z)

        z = chunk_from(slot, 0, z)

        def extra(ch, z):
            row0 = (pstart // TB) * rows_per_blk + ch * window_rows
            cp = pltpu.make_async_copy(
                a_hbm.at[pl.ds(row0, window_rows)], tri_vmem.at[2],
                dma_sem.at[2])
            cp.start()
            cp.wait()
            return chunk_from(2, ch, z)

        return jax.lax.fori_loop(1, n_chunks, extra, z)

    def cluster_body(c, z):
        could = could_hit(cl_ref, c)
        count = cl_ref[c, 7].astype(jnp.int32)

        def run(z):
            cp = cl_dma(2, c)
            cp.start()
            cp.wait()
            return process_cluster(c, 2, z)

        return jax.lax.cond(jnp.any(could) & (count > 0), run,
                            lambda z: z, z)

    if use_super:
        def perm(si):
            """si-th super in this tile's front-to-back octant order."""
            return _octant_perm(sup_ref, o_idx, si)

        def super_body(si, z):
            s = perm(si)
            could = could_hit(sup_ref, s)
            cnt = sup_ref[s, 7].astype(jnp.int32)

            def child_perm(row):
                """k-th child (row = base + k) of this tile's front-to-back
                octant order, as a relative index (cl cols 8..15)."""
                return _octant_perm(cl_ref, o_idx, row)

            def descend(z):
                # double-buffered children: cluster k+1's window streams
                # in while cluster k is swept (a descended super's
                # children are spatially adjacent, so unconditional
                # prefetch rarely wastes a transfer).  Slots must be
                # compile-time, so parity picks the slot via cond.
                # Children visit FRONT-TO-BACK per octant (cl cols 8..15):
                # near sweeps shrink best.t before far children's slabs.
                base = s * SUPER
                cl_dma(0, base + child_perm(base)).start()

                def child(k, z):
                    c = base + child_perm(base + k)
                    par = k % 2
                    have_next = k + 1 < SUPER
                    c_next = base + child_perm(
                        base + jnp.minimum(k + 1, SUPER - 1))

                    @pl.when(have_next & (par == 0))
                    def _():
                        cl_dma(1, c_next).start()

                    @pl.when(have_next & (par == 1))
                    def _():
                        cl_dma(0, c_next).start()

                    @pl.when(par == 0)
                    def _():
                        cl_dma(0, c).wait()

                    @pl.when(par == 1)
                    def _():
                        cl_dma(1, c).wait()

                    could_c = could_hit(cl_ref, c)
                    count = cl_ref[c, 7].astype(jnp.int32)
                    return jax.lax.cond(
                        jnp.any(could_c) & (count > 0),
                        lambda zz: jax.lax.cond(
                            par == 0,
                            lambda z2: process_cluster(c, 0, z2),
                            lambda z2: process_cluster(c, 1, z2), zz),
                        lambda zz: zz, z)

                return jax.lax.fori_loop(0, SUPER, child, z)

            return jax.lax.cond(jnp.any(could) & (cnt > 0), descend,
                                lambda z: z, z)

        jax.lax.fori_loop(0, cl_ref.shape[0] // SUPER, super_body,
                          jnp.int32(0))
    else:
        jax.lax.fori_loop(0, cl_ref.shape[0], cluster_body, jnp.int32(0))


def _safe_inv3(rdx, rdy, rdz):
    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                               jnp.where(d >= 0.0, 1e-12, -1e-12), d)

    return safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)


def _tile_octant(dx, dy, dz):
    """Tile octant from the lane-0 ray (tiles are octant-sorted by
    _sorted_call; a mixed boundary tile just gets a suboptimal ORDER,
    never a wrong result)."""
    return ((dx[0, 0] >= 0.0).astype(jnp.int32)
            + (dy[0, 0] >= 0.0).astype(jnp.int32) * 2
            + (dz[0, 0] >= 0.0).astype(jnp.int32) * 4)


def _octant_perm(ref, o_idx, row):
    """``row``-th entry of ``ref``'s baked per-octant order columns
    (cols 8..15) for octant ``o_idx`` — the front-to-back traversal
    permutation shared by the VMEM and streaming kernels (supers via
    ``sup_ref``, children-within-super via ``cl_ref``)."""
    v = ref[row, 8]
    for o in range(1, 8):
        v = jnp.where(o_idx == o, ref[row, 8 + o], v)
    return v.astype(jnp.int32)


def _vpu_slot_eval(read, rox, roy, roz, rdx, rdy, rdz, t_gate_lo):
    """One triangle (a 16-lane slot: v0, e1, e2 precomputed) against the
    whole ray tile via the shared ``_mt_from_edges`` body, so u/v/t agree
    bit-for-bit with the VMEM kernel.  Returns (ok, t)."""
    ok, _, _, t = _mt_from_edges(
        (read(0), read(1), read(2)), (read(3), read(4), read(5)),
        (read(6), read(7), read(8)), rox, roy, roz, rdx, rdy, rdz,
        t_gate_lo)
    return ok, t


def sub_rows(rows: int) -> int:
    """Sub-tile height for the predicated cluster sweeps: the slab cull
    tests every sub-tile separately and only live sub-tiles sweep the
    cluster's triangles.  PT_TPU_SUBROWS opts in (0 = whole-tile sweeps,
    the DEFAULT): hardware A/Bs 2026-08-19 (docs/measurements_r3.jsonl)
    measured the predication LOSING everywhere — streamed 327k-tri 1080p
    0.952 vs 1.002 Mpaths/s (sub 16: 1.010), textured-81920 fused tier
    0.749 vs 1.178, and the 100k-tri megakernel 1.097 vs round-2's 1.165 —
    the per-(window, cluster) re-test plus the lost cross-window
    pipelining outweigh the skipped triangle math at every shape tried
    (sorted tiles are coherent enough that most windows enter the same
    clusters anyway)."""
    env = os.environ.get("PT_TPU_SUBROWS")
    sr = int(env) if env else 0
    if sr <= 0 or sr >= rows:
        return rows
    return sr


def _nearest_stream_prologue(sph_ref, rox, roy, roz, rdx, rdy, rdz,
                             t_out, idx_out, kind_out, ns, nl):
    """Shared nearest-hit init for the streaming sweeps: output refs
    initialized, spheres+light balls swept (geometric.cuh:240-259, order =
    tie-break), and the t-limited cluster slab cull returned as a closure
    over the live best-t state.  The closure takes an optional static row
    window ``(r0, nr)`` so the kernels can re-test per sub-tile."""
    t_out[...] = jnp.full(rox.shape, INF, jnp.float32)
    idx_out[...] = jnp.full(rox.shape, -1, jnp.int32)
    kind_out[...] = jnp.zeros(rox.shape, jnp.int32)

    def sph_body(i, z):
        cx = sph_ref[i, 0]; cy = sph_ref[i, 1]; cz = sph_ref[i, 2]
        r = sph_ref[i, 3]
        ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
        b = ocx * rdx + ocy * rdy + ocz * rdz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        h = b * b - c
        sh = jnp.sqrt(jnp.maximum(h, 0.0))
        t1 = -b - sh
        t2 = -b + sh
        ok = (h >= 0.0) & (r > 0.0)
        v1 = ok & (t1 > EPSILON)
        v2 = ok & (t2 > EPSILON)
        t = jnp.where(v1, t1, jnp.where(v2, t2, INF))
        bt = t_out[...]
        closer = t < bt
        t_out[...] = jnp.where(closer, t, bt)
        idx_out[...] = jnp.where(closer, i, idx_out[...])
        kind = jnp.where(sph_ref[i, 14] > 0.0, 2, 1)
        kind_out[...] = jnp.where(closer, kind, kind_out[...])
        return z

    jax.lax.fori_loop(0, ns + nl, sph_body, jnp.int32(0))

    invx, invy, invz = _safe_inv3(rdx, rdy, rdz)

    def could_hit(ref, c, win=None):
        if win is None:
            tlim = t_out[...]
            ox, oy, oz = rox, roy, roz
            ix, iy, iz = invx, invy, invz
        else:
            r0, nr = win
            tlim = t_out[r0:r0 + nr, :]
            ox, oy, oz = (rox[r0:r0 + nr], roy[r0:r0 + nr],
                          roz[r0:r0 + nr])
            ix, iy, iz = (invx[r0:r0 + nr], invy[r0:r0 + nr],
                          invz[r0:r0 + nr])
        t0x = (ref[c, 0] - ox) * ix
        t1x = (ref[c, 3] - ox) * ix
        t0y = (ref[c, 1] - oy) * iy
        t1y = (ref[c, 4] - oy) * iy
        t0z = (ref[c, 2] - oz) * iz
        t1z = (ref[c, 5] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), EPSILON))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        ok = (tn <= tf) & (tn < tlim)
        if os.environ.get("PT_TPU_STREAM_NOCULL") == "1":
            # roofline probe (bench --config streamroof): force every
            # cluster/super entered so the triangle-test COUNT is exact
            # (rays x padded tri slots) — the achieved tests/s then prices
            # the sweep core against VPU peak with no culling unknowns
            return ok | True
        return ok

    return could_hit


def _nearest_stream_kernel_vpu(sph_ref, a_hbm, cl_ref, sup_ref, blk_ref,
                               *args, ns, nl, use_super, block_gate=False,
                               compact=False):
    """Nearest hit for HBM-streamed meshes: triangles stream as 8x16-lane
    slot rows (``pack_scene_stream_vpu``) and each slot sweeps one SUB-TILE
    of rays with the ``_mt_core`` arithmetic, best (t, idx, kind) carried
    in registers across a chunk (one output-ref RMW per sub-tile per
    chunk).  The kernel returns only (t, index, kind); winner attributes
    resolve OUTSIDE via one XLA row-gather (in-kernel per-triangle
    attribute selects cost ~25% of the sweep).  kind: 0 miss, 1 sphere,
    2 light ball, 3 triangle; idx is the sphere row or PADDED triangle
    index.

    Sub-tile predication (``sub_rows()``, opt-in: measured losing): the
    cluster slab cull re-tests every row window against ITS OWN best-t
    before sweeping, so a chunk's triangle math only runs for windows
    that can still improve.

    ``PT_TPU_STREAM_NEUTER=sweep`` (trace-time, timing bisect ONLY —
    results are wrong) keeps the full traversal + DMA skeleton but skips
    the per-slot triangle math, attributing streamed-pass cycles between
    the sweep and everything around it.

    ``compact`` (round 4, lane compaction): an extra SMEM ``(1, 1)``
    ``n_live`` scalar precedes the ray refs; the caller sorted dead lanes
    to the END of the batch, so any tile whose first lane is at or past
    ``n_live`` holds ONLY dead lanes and skips the sphere sweep and the
    whole traversal (outputs keep their miss init)."""
    if compact:
        nlive_ref, ox, oy, oz, dx, dy, dz = args[:7]
        t_out, idx_out, kind_out, tri_vmem, dma_sem = args[7:]
    else:
        ox, oy, oz, dx, dy, dz = args[:6]
        t_out, idx_out, kind_out, tri_vmem, dma_sem = args[6:]
    neuter = os.environ.get("PT_TPU_STREAM_NEUTER", "")
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    rows = ox.shape[0]
    sr = sub_rows(rows)
    if compact:
        t_out[...] = jnp.full(rox.shape, INF, jnp.float32)
        idx_out[...] = jnp.full(rox.shape, -1, jnp.int32)
        kind_out[...] = jnp.zeros(rox.shape, jnp.int32)
        live_tile = pl.program_id(0) * rows * LANE < nlive_ref[0, 0]

        @pl.when(live_tile)
        def _():
            _nearest_stream_body(
                sph_ref, a_hbm, cl_ref, sup_ref, blk_ref,
                rox, roy, roz, rdx, rdy, rdz, dx, dy, dz,
                t_out, idx_out, kind_out, tri_vmem, dma_sem,
                ns=ns, nl=nl, use_super=use_super, block_gate=block_gate,
                rows=rows, sr=sr, neuter=neuter)
        return
    _nearest_stream_body(
        sph_ref, a_hbm, cl_ref, sup_ref, blk_ref,
        rox, roy, roz, rdx, rdy, rdz, dx, dy, dz,
        t_out, idx_out, kind_out, tri_vmem, dma_sem,
        ns=ns, nl=nl, use_super=use_super, block_gate=block_gate,
        rows=rows, sr=sr, neuter=neuter)


def _nearest_stream_body(sph_ref, a_hbm, cl_ref, sup_ref, blk_ref,
                         rox, roy, roz, rdx, rdy, rdz, dx, dy, dz,
                         t_out, idx_out, kind_out, tri_vmem, dma_sem,
                         *, ns, nl, use_super, block_gate, rows, sr,
                         neuter):
    could_hit = _nearest_stream_prologue(
        sph_ref, rox, roy, roz, rdx, rdy, rdz,
        t_out, idx_out, kind_out, ns, nl)

    def sweep_window(sl, nb, base, r0, nr, z):
        bt = t_out[r0:r0 + nr, :]
        if neuter == "sweep":
            # consume the DMA'd window with one data-dependent no-op
            t_out[r0:r0 + nr, :] = bt + tri_vmem[sl, 0, 0] * 0.0
            return z
        bi = idx_out[r0:r0 + nr, :]
        bk = kind_out[r0:r0 + nr, :]
        sx, sy, sz = rox[r0:r0 + nr], roy[r0:r0 + nr], roz[r0:r0 + nr]
        sdx, sdy, sdz = rdx[r0:r0 + nr], rdy[r0:r0 + nr], rdz[r0:r0 + nr]

        def slot_rows(rbase, rcount, carry):
            def row_body(r, carry):
                bt, bi, bk = carry
                for k in range(VPU_TPR):
                    def rd(col, k=k, r=r):
                        return tri_vmem[sl, r, k * VPU_SLOT + col]

                    ok, t = _vpu_slot_eval(rd, sx, sy, sz, sdx, sdy, sdz,
                                           EPSILON)
                    t = jnp.where(ok, t, INF)
                    closer = t < bt
                    bt = jnp.where(closer, t, bt)
                    bi = jnp.where(closer, base + r * VPU_TPR + k, bi)
                    bk = jnp.where(closer, 3, bk)
                return bt, bi, bk

            return jax.lax.fori_loop(rbase, rbase + rcount, row_body,
                                     carry)

        if block_gate:
            # per-32-triangle-block slab gate against the CARRIED best-t
            # (round-3 bisect: triangle math is 67% of a streamed pass and
            # tile-level selectivity is saturated — the leftover
            # selectivity is inside the chunk)
            ivx, ivy, ivz = _safe_inv3(sdx, sdy, sdz)
            b0 = base // TB

            def blk_body(j, carry):
                bt = carry[0]
                t0x = (blk_ref[b0 + j, 0] - sx) * ivx
                t1x = (blk_ref[b0 + j, 3] - sx) * ivx
                t0y = (blk_ref[b0 + j, 1] - sy) * ivy
                t1y = (blk_ref[b0 + j, 4] - sy) * ivy
                t0z = (blk_ref[b0 + j, 2] - sz) * ivz
                t1z = (blk_ref[b0 + j, 5] - sz) * ivz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.maximum(jnp.minimum(t0z, t1z),
                                             EPSILON))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                could = (tn <= tf) & (tn < bt)
                return jax.lax.cond(
                    jnp.any(could),
                    lambda c, j=j: slot_rows(j * VPU_ROWS_PER_BLK,
                                             VPU_ROWS_PER_BLK, c),
                    lambda c: c, carry)

            bt, bi, bk = jax.lax.fori_loop(0, nb, blk_body, (bt, bi, bk))
        else:
            bt, bi, bk = slot_rows(0, nb * VPU_ROWS_PER_BLK, (bt, bi, bk))
        t_out[r0:r0 + nr, :] = bt
        idx_out[r0:r0 + nr, :] = bi
        kind_out[r0:r0 + nr, :] = bk
        return z

    def process_chunk(sl, nb, base, c, z):
        for st in range(rows // sr):
            r0 = st * sr
            if sr == rows:
                z = sweep_window(sl, nb, base, r0, sr, z)
            else:
                live = jnp.any(could_hit(cl_ref, c, (r0, sr)))
                z = jax.lax.cond(
                    live,
                    lambda zz, r0=r0: sweep_window(sl, nb, base, r0, sr,
                                                   zz),
                    lambda zz: zz, z)
        return z

    _stream_traverse(cl_ref, sup_ref, a_hbm, tri_vmem, dma_sem, could_hit,
                     process_chunk, use_super, _tile_octant(dx, dy, dz),
                     rows_per_blk=VPU_ROWS_PER_BLK)


def _blocker_stream_prologue(sph_ref, rox, roy, roz, rdx, rdy, rdz, md,
                             blocked_out, ns, nl, blocks_col, min_d):
    """Shared any-hit init for the streaming sweeps: output ref zeroed,
    spheres+light balls swept honoring their can-block flag, and the
    blocked-aware cluster slab cull returned as a closure."""
    blocked_out[...] = jnp.zeros(rox.shape, jnp.int32)

    def sph_body(i, z):
        cx = sph_ref[i, 0]; cy = sph_ref[i, 1]; cz = sph_ref[i, 2]
        r = sph_ref[i, 3]
        can_block = sph_ref[i, blocks_col]
        ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
        b = ocx * rdx + ocy * rdy + ocz * rdz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        h = b * b - c
        sh = jnp.sqrt(jnp.maximum(h, 0.0))
        t1 = -b - sh
        t2 = -b + sh
        ok = (h >= 0.0) & (r > 0.0) & (can_block > 0.0)
        v1 = ok & (t1 > EPSILON) & (t1 < md)
        v2 = ok & (t2 > EPSILON) & (t2 < md)
        t = jnp.where(v1, t1, jnp.where(v2, t2, INF))
        blocked_out[...] = (blocked_out[...]
                            | ((t < INF) & (t > min_d)).astype(jnp.int32))
        return z

    jax.lax.fori_loop(0, ns, sph_body, jnp.int32(0))

    invx, invy, invz = _safe_inv3(rdx, rdy, rdz)

    def could_hit(ref, c, win=None):
        if win is None:
            blocked = blocked_out[...]
            ox, oy, oz = rox, roy, roz
            ix, iy, iz = invx, invy, invz
            mdw = md
        else:
            r0, nr = win
            blocked = blocked_out[r0:r0 + nr, :]
            ox, oy, oz = (rox[r0:r0 + nr], roy[r0:r0 + nr],
                          roz[r0:r0 + nr])
            ix, iy, iz = (invx[r0:r0 + nr], invy[r0:r0 + nr],
                          invz[r0:r0 + nr])
            mdw = md[r0:r0 + nr]
        t0x = (ref[c, 0] - ox) * ix
        t1x = (ref[c, 3] - ox) * ix
        t0y = (ref[c, 1] - oy) * iy
        t1y = (ref[c, 4] - oy) * iy
        t0z = (ref[c, 2] - oz) * iz
        t1z = (ref[c, 5] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), min_d))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        return (tn <= tf) & (tn < mdw) & (blocked == 0)

    return could_hit


def _blocker_stream_kernel_vpu(sph_ref, a_hbm, cl_ref, sup_ref, blk_ref,
                               *args, ns, nl, blocks_col, use_super,
                               block_gate=False, compact=False):
    """any-hit in (1e-3, maxd) for HBM-streamed meshes; the per-triangle
    can-block flag rides in slot lane 9 (``pack_scene_stream_vpu``).
    Sub-tile predicated like the nearest kernel — a row window whose lanes
    are all blocked (or can't reach the cluster) skips the sweep.
    ``compact``: see ``_nearest_stream_kernel_vpu`` (dead-lane tiles skip
    everything; their lanes report unblocked)."""
    if compact:
        nlive_ref, ox, oy, oz, dx, dy, dz, maxd = args[:8]
        blocked_out, tri_vmem, dma_sem = args[8:]
    else:
        ox, oy, oz, dx, dy, dz, maxd = args[:7]
        blocked_out, tri_vmem, dma_sem = args[7:]
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    md = maxd[...]
    rows = ox.shape[0]
    sr = sub_rows(rows)
    if compact:
        blocked_out[...] = jnp.zeros(rox.shape, jnp.int32)
        live_tile = pl.program_id(0) * rows * LANE < nlive_ref[0, 0]

        @pl.when(live_tile)
        def _():
            _blocker_stream_body(
                sph_ref, a_hbm, cl_ref, sup_ref, blk_ref,
                rox, roy, roz, rdx, rdy, rdz, dx, dy, dz, md,
                blocked_out, tri_vmem, dma_sem,
                ns=ns, nl=nl, blocks_col=blocks_col, use_super=use_super,
                block_gate=block_gate, rows=rows, sr=sr)
        return
    _blocker_stream_body(
        sph_ref, a_hbm, cl_ref, sup_ref, blk_ref,
        rox, roy, roz, rdx, rdy, rdz, dx, dy, dz, md,
        blocked_out, tri_vmem, dma_sem,
        ns=ns, nl=nl, blocks_col=blocks_col, use_super=use_super,
        block_gate=block_gate, rows=rows, sr=sr)


def _blocker_stream_body(sph_ref, a_hbm, cl_ref, sup_ref, blk_ref,
                         rox, roy, roz, rdx, rdy, rdz, dx, dy, dz, md,
                         blocked_out, tri_vmem, dma_sem,
                         *, ns, nl, blocks_col, use_super, block_gate,
                         rows, sr):
    MIN_D = 1e-3
    could_hit = _blocker_stream_prologue(
        sph_ref, rox, roy, roz, rdx, rdy, rdz, md, blocked_out,
        ns, nl, blocks_col, MIN_D)

    def sweep_window(sl, nb, base, r0, nr, z):
        bb = blocked_out[r0:r0 + nr, :]
        if os.environ.get("PT_TPU_STREAM_NEUTER", "") == "sweep":
            blocked_out[r0:r0 + nr, :] = (
                bb | (tri_vmem[sl, 0, 0] * 0.0).astype(jnp.int32))
            return z
        sx, sy, sz = rox[r0:r0 + nr], roy[r0:r0 + nr], roz[r0:r0 + nr]
        sdx, sdy, sdz = rdx[r0:r0 + nr], rdy[r0:r0 + nr], rdz[r0:r0 + nr]
        mdw = md[r0:r0 + nr]

        def slot_rows(rbase, rcount, bb):
            def row_body(r, bb):
                for k in range(VPU_TPR):
                    def rd(col, k=k, r=r):
                        return tri_vmem[sl, r, k * VPU_SLOT + col]

                    ok, t = _vpu_slot_eval(rd, sx, sy, sz, sdx, sdy, sdz,
                                           MIN_D)
                    hit = ok & (t < mdw) & (rd(9) > 0.0)
                    bb = bb | hit.astype(jnp.int32)
                return bb

            return jax.lax.fori_loop(rbase, rbase + rcount, row_body, bb)

        if block_gate:
            # per-block slab gate vs segment length + already-blocked
            # (see the nearest kernel's note)
            ivx, ivy, ivz = _safe_inv3(sdx, sdy, sdz)
            b0 = base // TB

            def blk_body(j, bb):
                t0x = (blk_ref[b0 + j, 0] - sx) * ivx
                t1x = (blk_ref[b0 + j, 3] - sx) * ivx
                t0y = (blk_ref[b0 + j, 1] - sy) * ivy
                t1y = (blk_ref[b0 + j, 4] - sy) * ivy
                t0z = (blk_ref[b0 + j, 2] - sz) * ivz
                t1z = (blk_ref[b0 + j, 5] - sz) * ivz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.maximum(jnp.minimum(t0z, t1z),
                                             MIN_D))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                could = (tn <= tf) & (tn < mdw) & (bb == 0)
                return jax.lax.cond(
                    jnp.any(could),
                    lambda b, j=j: slot_rows(j * VPU_ROWS_PER_BLK,
                                             VPU_ROWS_PER_BLK, b),
                    lambda b: b, bb)

            bb = jax.lax.fori_loop(0, nb, blk_body, bb)
        else:
            bb = slot_rows(0, nb * VPU_ROWS_PER_BLK, bb)
        blocked_out[r0:r0 + nr, :] = bb
        return z

    def process_chunk(sl, nb, base, c, z):
        for st in range(rows // sr):
            r0 = st * sr
            if sr == rows:
                z = sweep_window(sl, nb, base, r0, sr, z)
            else:
                live = jnp.any(could_hit(cl_ref, c, (r0, sr)))
                z = jax.lax.cond(
                    live,
                    lambda zz, r0=r0: sweep_window(sl, nb, base, r0, sr,
                                                   zz),
                    lambda zz: zz, z)
        return z

    _stream_traverse(cl_ref, sup_ref, a_hbm, tri_vmem, dma_sem, could_hit,
                     process_chunk, use_super, _tile_octant(dx, dy, dz),
                     rows_per_blk=VPU_ROWS_PER_BLK)


def _whole(tab):
    return pl.BlockSpec(tab.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _resolve_stream_attrs(t, idx, kind, ro, rd, sph_tab, attr_tab, vert_tab,
                          with_uv):
    """XLA-side winner attribute resolution for the streaming nearest-hit:
    one row-gather each from the sphere / padded-triangle tables, sphere
    normals from the hit point, normals flipped toward the ray
    (geometric.cuh:350,365,383), and (with_uv) the winner's barycentrics
    recomputed in classic Moller-Trumbore form for UV interpolation."""
    hit = kind > 0
    is_tri = kind == 3
    is_sph = hit & ~is_tri
    ti = jnp.where(is_tri, jnp.clip(idx, 0, attr_tab.shape[0] - 1), 0)
    arow = attr_tab[ti]                                   # (B,16)
    si = jnp.where(is_sph, jnp.clip(idx, 0, sph_tab.shape[0] - 1), 0)
    srow = sph_tab[si]                                    # (B,16)

    tc = jnp.where(hit, t, 0.0)[:, None]
    sn = (ro + rd * tc - srow[:, 0:3]) / jnp.maximum(srow[:, 3:4], 1e-20)
    n = jnp.where(is_tri[:, None], arow[:, 0:3], sn)
    ndotd = jnp.sum(n * rd, axis=-1)
    n = n * jnp.where(ndotd > 0.0, -1.0, 1.0)[:, None]
    n = n * hit[:, None]

    m = hit.astype(jnp.float32)
    out = dict(
        t=t,
        nx=n[:, 0], ny=n[:, 1], nz=n[:, 2],
        bcr=m * jnp.where(is_tri, arow[:, 3], srow[:, 8]),
        bcg=m * jnp.where(is_tri, arow[:, 4], srow[:, 9]),
        bcb=m * jnp.where(is_tri, arow[:, 5], srow[:, 10]),
        rough=m * jnp.where(is_tri, arow[:, 6], srow[:, 11]),
        metal=m * jnp.where(is_tri, arow[:, 7], srow[:, 12]),
        eta=m * jnp.where(is_tri, arow[:, 8], srow[:, 13]),
        flag=jnp.where(is_tri, 1, kind),
    )
    if with_uv:
        vr = vert_tab[ti]                                 # (B,9)
        v0 = vr[:, 0:3]
        e1 = vr[:, 3:6] - v0
        e2 = vr[:, 6:9] - v0
        h = jnp.cross(rd, e2)
        a = jnp.sum(e1 * h, axis=-1)
        f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1.0, a)
        s = ro - v0
        u = f * jnp.sum(s * h, axis=-1)
        q = jnp.cross(s, e1)
        v = f * jnp.sum(rd * q, axis=-1)
        w0 = 1.0 - u - v
        iu = w0 * arow[:, 9] + u * arow[:, 11] + v * arow[:, 13]
        iv = w0 * arow[:, 10] + u * arow[:, 12] + v * arow[:, 14]
        out["iu"] = jnp.where(is_tri, iu, 0.0)
        out["iv"] = jnp.where(is_tri, iv, 0.0)
        out["tex"] = jnp.where(is_tri, arow[:, 15], -1.0)
    return out


def block_gate_on(blk_tab) -> bool:
    """Per-32-triangle-block slab gating inside the streamed chunk sweep.
    PT_TPU_BLOCK_GATE=0 disables (A/B); the VMEM-resident block table is
    capped (rows beyond PT_TPU_BLOCK_GATE_CAP fall back to ungated sweeps
    rather than overflowing VMEM — 64k blocks = 2 MB covers ~2M tris)."""
    if os.environ.get("PT_TPU_BLOCK_GATE") == "0":
        return False
    cap = int(os.environ.get("PT_TPU_BLOCK_GATE_CAP", "65536"))
    return blk_tab.shape[0] <= cap


def _nlive_smem(n_live):
    """(1, 1) SMEM operand + spec for the lane-compaction scalar."""
    arr = jnp.asarray(n_live, jnp.int32).reshape(1, 1)
    spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return arr, spec


def _nearest_hit_stream(scene, ro, rd, with_uv, interpret, n_live=None):
    sph_tab, a_tab, attr_tab, vert_tab, cl_tab, ns, nl, nt, blk_tab = \
        pack_scene_stream_vpu(scene)
    cl_tab, sup_tab, use_super = super_table(cl_tab)
    B = ro.shape[0]
    rows = tile_rows(True)
    comps = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]]
    tiled = [_tile(c, rows)[0] for c in comps]
    rows_total = tiled[0].shape[0]
    grid = rows_total // rows

    compact = n_live is not None
    extra_in, extra_spec = ([], [])
    if compact:
        arr, spec = _nlive_smem(n_live)
        extra_in, extra_spec = [arr], [spec]
    kernel = functools.partial(_nearest_stream_kernel_vpu, ns=ns, nl=nl,
                               use_super=use_super,
                               block_gate=block_gate_on(blk_tab),
                               compact=compact)
    shapes = [jnp.float32, jnp.int32, jnp.int32]
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            _whole(sph_tab),
            pl.BlockSpec(memory_space=pl.ANY),
            _whole(cl_tab),
            _whole(sup_tab),
            _whole(blk_tab),
            *extra_spec,
            *_ray_specs(6, rows),
        ],
        out_specs=[pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in shapes],
        out_shape=[jax.ShapeDtypeStruct((rows_total, LANE), dt)
                   for dt in shapes],
        scratch_shapes=_stream_scratch(VPU_WINDOW),
        interpret=interpret,
    )(sph_tab, a_tab, cl_tab, sup_tab, blk_tab, *extra_in, *tiled)
    t, idx, kind = (o.reshape(-1)[:B] for o in outs)
    return _resolve_stream_attrs(t, idx, kind, ro, rd, sph_tab, attr_tab,
                                 vert_tab, with_uv)


def _any_blocker_stream(scene, p1, rd, max_d, dielectrics_block, interpret,
                        n_live=None):
    sph_tab, a_tab, _, _, cl_tab, ns, nl, nt, blk_tab = \
        pack_scene_stream_vpu(scene, dielectrics_block=dielectrics_block)
    cl_tab, sup_tab, use_super = super_table(cl_tab)
    B = p1.shape[0]
    rows = tile_rows(True)
    comps = [p1[:, 0], p1[:, 1], p1[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
             max_d]
    tiled = [_tile(c, rows)[0] for c in comps]
    rows_total = tiled[0].shape[0]
    grid = rows_total // rows

    compact = n_live is not None
    extra_in, extra_spec = ([], [])
    if compact:
        arr, spec = _nlive_smem(n_live)
        extra_in, extra_spec = [arr], [spec]
    kernel = functools.partial(
        _blocker_stream_kernel_vpu, ns=ns, nl=nl,
        blocks_col=4 if dielectrics_block else 5, use_super=use_super,
        block_gate=block_gate_on(blk_tab), compact=compact)
    blocked = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            _whole(sph_tab),
            pl.BlockSpec(memory_space=pl.ANY),
            _whole(cl_tab),
            _whole(sup_tab),
            _whole(blk_tab),
            *extra_spec,
            *_ray_specs(7, rows),
        ],
        out_specs=pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_total, LANE), jnp.int32),
        scratch_shapes=_stream_scratch(VPU_WINDOW),
        interpret=interpret,
    )(sph_tab, a_tab, cl_tab, sup_tab, blk_tab, *extra_in, *tiled)
    return blocked.reshape(-1)[:B] != 0


def nearest_hit_pallas(scene: Scene, ro: jnp.ndarray, rd: jnp.ndarray,
                       with_uv: bool = False, force_stream: bool = False,
                       interpret: bool = False, n_live=None):
    """Returns a dict of per-ray hit attributes (all (B,)):
    t, normal xyz (flipped toward the ray), material fields, and flag
    (0 miss / 1 surface / 2 light ball).  ``with_uv`` adds interpolated
    texture coordinates iu/iv (f32) and the texture id tex (f32, -1 =
    untextured) for textured mesh scenes.

    Meshes beyond ``max_vmem_tris()`` automatically switch to the
    HBM-streaming kernel (``force_stream`` pins it for tests).

    ``n_live``: lane-compaction scalar — the caller sorted consumed lanes
    first (``_sorted_call(live=...)``); tiles wholly past ``n_live``
    report misses without sweeping anything."""
    interpret = interpret or interp_forced()
    if _stream_mode(scene.num_triangles, force_stream):
        return _nearest_hit_stream(scene, ro, rd, with_uv, interpret,
                                   n_live=n_live)
    sph_tab, tri_tab, cl_tab, ns, nl, nt = pack_scene(scene, with_uv=with_uv)
    cl_tab, sup_tab, use_super = super_table(cl_tab)
    B = ro.shape[0]
    rows = tile_rows(False, tex=with_uv, nt=nt)
    comps = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]]
    tiled = [_tile(c, rows)[0] for c in comps]
    rows_total = tiled[0].shape[0]
    grid = rows_total // rows

    compact = n_live is not None
    extra_in, extra_spec = ([], [])
    if compact:
        arr, spec = _nlive_smem(n_live)
        extra_in, extra_spec = [arr], [spec]
    # sub-tile the cluster walk only for real meshes: tiny scenes (one
    # all-covering cluster) would pay the per-window loop overhead for
    # nothing
    sr = sub_rows(rows) if cl_tab.shape[0] >= 16 else None
    kernel = functools.partial(_nearest_kernel, ns=ns, nl=nl, nt=nt,
                               with_uv=with_uv, use_super=use_super, sr=sr,
                               compact=compact)
    shapes = [jnp.float32] * 10 + [jnp.int32]
    if with_uv:
        shapes += [jnp.float32] * 3
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            _whole(sph_tab),
            _whole(tri_tab),
            _whole(cl_tab),
            _whole(sup_tab),
            *extra_spec,
            *_ray_specs(6, rows),
        ],
        out_specs=[pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in shapes],
        out_shape=[jax.ShapeDtypeStruct((rows_total, LANE), dt)
                   for dt in shapes],
        interpret=interpret,
    )(sph_tab, tri_tab, cl_tab, sup_tab, *extra_in, *tiled)
    names = ["t", "nx", "ny", "nz", "bcr", "bcg", "bcb", "rough", "metal",
             "eta", "flag"]
    if with_uv:
        names += ["iu", "iv", "tex"]
    return {n: o.reshape(-1)[:B] for n, o in zip(names, outs)}


def any_blocker_pallas(scene: Scene, p1: jnp.ndarray, rd: jnp.ndarray,
                       max_d: jnp.ndarray, dielectrics_block: bool,
                       force_stream: bool = False, interpret: bool = False,
                       n_live=None):
    """Returns blocked (B,) bool for shadow rays p1 + t*rd, t in (1e-3, max_d).
    ``n_live``: lane compaction (see ``nearest_hit_pallas``)."""
    interpret = interpret or interp_forced()
    if _stream_mode(scene.num_triangles, force_stream):
        return _any_blocker_stream(scene, p1, rd, max_d, dielectrics_block,
                                   interpret, n_live=n_live)
    sph_tab, tri_tab, cl_tab, ns, nl, nt = pack_scene(scene)
    cl_tab, sup_tab, use_super = super_table(cl_tab)
    B = p1.shape[0]
    rows = tile_rows(False)
    comps = [p1[:, 0], p1[:, 1], p1[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
             max_d]
    tiled = [_tile(c, rows)[0] for c in comps]
    rows_total = tiled[0].shape[0]
    grid = rows_total // rows

    compact = n_live is not None
    extra_in, extra_spec = ([], [])
    if compact:
        arr, spec = _nlive_smem(n_live)
        extra_in, extra_spec = [arr], [spec]
    kernel = functools.partial(
        _blocker_kernel, ns=ns, nl=nl, nt=nt,
        blocks_col=4 if dielectrics_block else 5, use_super=use_super,
        sr=sub_rows(rows) if cl_tab.shape[0] >= 16 else None,
        compact=compact)
    blocked = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            _whole(sph_tab),
            _whole(tri_tab),
            _whole(cl_tab),
            _whole(sup_tab),
            *extra_spec,
            *_ray_specs(7, rows),
        ],
        out_specs=pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_total, LANE), jnp.int32),
        interpret=interpret,
    )(sph_tab, tri_tab, cl_tab, sup_tab, *extra_in, *tiled)
    return blocked.reshape(-1)[:B] != 0
