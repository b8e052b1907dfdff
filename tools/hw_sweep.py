"""Single-process hardware measurement sweep.

Why one process: through this environment's tunneled TPU, a NEW client
connecting after ANY previous client exits (cleanly or killed) waits
many minutes for the old grant to release — measured 2026-08-19: a probe
started seconds after a clean exit hung >9 min.  The shell runbook
(tools/hw_measure.sh) pays that wait on EVERY step; this driver connects
once and runs every step in-process, toggling the A/B env knobs (all
read at trace time) with ``jax.clear_caches()`` between toggles.

Usage:  python tools/hw_sweep.py [--deadline-min M] [--steps a,b,...]

Emits one JSON line per completed step (stdout + incremental append to
/tmp/hw_measure/results.jsonl).  Steps are ordered decision-critical
first; the deadline is checked BETWEEN steps only (never kill a TPU op
mid-flight — that wedges the chip).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ns(**kw):
    base = dict(config="0", obj="tests/fixtures/sphere.obj", gen_tris=0,
                gen_tex=False, spp=0, res="", fast=False, conn_samples=0,
                resample=None, regen_rmse_target=False, scene="")
    base.update(kw)
    return argparse.Namespace(**base)


# (tag, env overrides, bench-args) — decision-critical steps first.
# Every A/B step pins ITS side's env explicitly (a default flip must not
# silently turn an A/B into three identical runs — ADVICE r2 item 1).
STEPS = [
    ("headline",        {}, _ns()),
    # leaf-8 clustering of small text scenes is a new default — A/B the
    # old single-cluster behavior on the two scenes it changes
    ("headline_leaf64", {"PT_TPU_LEAF_SIZE": "64"}, _ns()),
    ("config5_leaf64",  {"PT_TPU_LEAF_SIZE": "64"}, _ns(config="5")),
    ("stream_sub8",     {"PT_TPU_SUBROWS": "8"},
     _ns(config="3", gen_tris=249000, spp=4)),
    ("stream_sub0",     {"PT_TPU_SUBROWS": "0"},
     _ns(config="3", gen_tris=249000, spp=4)),
    # round-4 lane compaction A/B (default ON; this step reverts it)
    ("stream_nocompact", {"PT_TPU_NO_COMPACT": "1"},
     _ns(config="3", gen_tris=249000, spp=4)),
    ("tex50k_sub8",     {"PT_TPU_SUBROWS": "8"},
     _ns(config="3", gen_tris=50000, gen_tex=True, spp=16)),
    ("tex50k_sub0",     {"PT_TPU_SUBROWS": "0"},
     _ns(config="3", gen_tris=50000, gen_tex=True, spp=16)),
    ("ppm_fast",        {}, _ns(config="4", fast=True)),
    ("config2",         {}, _ns(config="2")),
    ("config5_ris",     {}, _ns(config="5")),
    ("rmse",            {}, _ns(config="rmse")),
    ("golden",          {}, _ns(config="golden")),
    ("input1080",       {}, _ns(scene="/root/reference/input.txt")),
    ("config1",         {}, _ns(config="1")),
    ("config5_k32",     {}, _ns(config="5", resample=32)),
    ("stream_sub16",    {"PT_TPU_SUBROWS": "16"},
     _ns(config="3", gen_tris=249000, spp=4)),
    ("vmem100k",        {}, _ns(config="3", gen_tris=100000, spp=16)),
    ("ppm_full",        {}, _ns(config="4")),
    ("config5_exact",   {}, _ns(config="5", resample=0, res="512x512")),
    # ---- phase-2 A/Bs (run via --steps after the decision steps) ----
    # finer direction bins in the coherence-sort key: the streamed sweep
    # is bounded by clusters entered per tile-union frustum, and the
    # 90-degree octant cone is its loosest term
    ("stream_dir4",     {"PT_TPU_DIR_BITS": "4"},
     _ns(config="3", gen_tris=249000, spp=4)),
    ("stream_dir6",     {"PT_TPU_DIR_BITS": "6"},
     _ns(config="3", gen_tris=249000, spp=4)),
    ("stream_dir8",     {"PT_TPU_DIR_BITS": "8"},
     _ns(config="3", gen_tris=249000, spp=4)),
    # streamed leaf-size: 256 won pre-supers; with supers + per-window
    # predication the slab-test/sweep tradeoff may have moved
    ("stream_leaf128",  {"PT_TPU_LEAF_SIZE": "128"},
     _ns(config="3", gen_tris=249000, spp=4)),
    ("stream_leaf512",  {"PT_TPU_LEAF_SIZE": "512"},
     _ns(config="3", gen_tris=249000, spp=4)),
    # config5 cycle attribution (renders are WRONG — timing bisect only):
    # eye-megakernel with the connection sweep removed / shadow removed /
    # eval removed.  config5_ris minus these = cost of the removed part.
    ("config5_no_connect", {"PT_TPU_BDPT_NEUTER": "connect"},
     _ns(config="5")),
    ("config5_no_shadow",  {"PT_TPU_BDPT_NEUTER": "shadow"},
     _ns(config="5")),
    ("config5_no_eval",    {"PT_TPU_BDPT_NEUTER": "eval"},
     _ns(config="5")),
    # config4 cycle attribution (flux is WRONG — timing bisect only)
    ("ppm_skeleton",       {"PT_TPU_PPM_NEUTER": "pairs"},
     _ns(config="4", fast=True)),
    ("ppm_no_eval",        {"PT_TPU_PPM_NEUTER": "eval"},
     _ns(config="4", fast=True)),
    ("ppm_no_windows",     {"PT_TPU_PPM_NEUTER": "windows"},
     _ns(config="4", fast=True)),
    # round 4: no gather AT ALL — isolates eye+photon trace + event
    # production from the gather kernel (the trace phases were invisible
    # to the in-kernel neuters and may dominate the 'skeleton' bucket)
    ("ppm_no_gather",      {"PT_TPU_PPM_NEUTER": "gather"},
     _ns(config="4", fast=True)),
    # round 4b: XLA prep (event sort/pack + hp pack + meta) WITHOUT the
    # join kernel — minus ppm_no_gather this prices the sort/pack bucket
    ("ppm_no_kernel",      {"PT_TPU_PPM_NEUTER": "kernel"},
     _ns(config="4", fast=True)),
    # tighter event cap: the pack gather runs at cap size (overflow
    # guards exactness — an overflowed row errors, it doesn't lie)
    ("ppm_cap35",          {"PT_TPU_PPM_CAPFRAC": "0.35"},
     _ns(config="4", fast=True)),
    ("ppm_cap25",          {"PT_TPU_PPM_CAPFRAC": "0.25"},
     _ns(config="4", fast=True)),
    # round 4c: 12 flat column gathers straight into block-major —
    # REFUTED (1.02 vs 1.78; XLA TPU flat 1-D gathers lower terribly),
    # the (E,12) row gather + transpose stays the default
    ("ppm_colgather",      {"PT_TPU_PPM_COLGATHER": "1"},
     _ns(config="4", fast=True)),
    # small-scene photon-trace compaction (round 4, default off).  Pinned
    # to the XLA scan: compaction lives in find_closest_hit, which the
    # photon megakernel bypasses — A/B against ppm_nomega, not ppm_fast.
    ("ppm_compact_small",  {"PT_TPU_COMPACT_SMALL": "1",
                            "PT_TPU_NO_PHOTON_MEGA": "1"},
     _ns(config="4", fast=True)),
    # round 4: photon-trace megakernel is the new default — this step
    # reverts to the XLA Threefry scan (same-session A/B)
    ("ppm_nomega",         {"PT_TPU_NO_PHOTON_MEGA": "1"},
     _ns(config="4", fast=True)),
    # cells-per-grid-step batching (round 3: the 'windows' neuter showed
    # ~25 us of fixed machinery per grid step dominating the pass)
    ("ppm_cpg1",           {"PT_TPU_PPM_CPG": "1"},
     _ns(config="4", fast=True)),
    ("ppm_cpg4",           {"PT_TPU_PPM_CPG": "4"},
     _ns(config="4", fast=True)),
    ("ppm_cpg16",          {"PT_TPU_PPM_CPG": "16"},
     _ns(config="4", fast=True)),
    # loop-nest A/B: hitpoint-sub outer x offsets inner
    ("ppm_hp_outer",       {"PT_TPU_PPM_HP_OUTER": "1"},
     _ns(config="4", fast=True)),
    # hp-outer composed with the larger cell batch (round 4)
    ("ppm_hp_cpg16",       {"PT_TPU_PPM_HP_OUTER": "1",
                            "PT_TPU_PPM_CPG": "16"},
     _ns(config="4", fast=True)),
    # event chunk size (round 4): 512 halves over-fetch on sub-chunk
    # windows, 2048 keeps big windows single-chunk
    ("ppm_ev512",          {"PT_TPU_PPM_EVCHUNK": "512"},
     _ns(config="4", fast=True)),
    ("ppm_ev2048",         {"PT_TPU_PPM_EVCHUNK": "2048"},
     _ns(config="4", fast=True)),
    # smaller ray TILES for the streamed sweep: unlike sub-windows
    # (which still DMA + loop per cluster at tile granularity and LOST),
    # an 8/16-row tile skips the whole per-cluster DMA+sweep when its own
    # union frustum misses — round-2 only measured 32/64/128 (32 best)
    ("stream_rows8",       {"PT_TPU_STREAM_TILE_ROWS": "8"},
     _ns(config="3", gen_tris=249000, spp=4)),
    ("stream_rows16",      {"PT_TPU_STREAM_TILE_ROWS": "16"},
     _ns(config="3", gen_tris=249000, spp=4)),
    # streamed-pass cycle attribution (results WRONG — timing only):
    # traversal + DMA skeleton with the triangle math removed
    ("stream_no_sweep",    {"PT_TPU_STREAM_NEUTER": "sweep"},
     _ns(config="3", gen_tris=249000, spp=4)),
    # tile-local RIS (round 3): speed at 1080p + matched-noise quality
    ("config5_tile64",     {"PT_TPU_TILE_RIS": "1"}, _ns(config="5")),
    ("config5_global64",   {"PT_TPU_TILE_RIS": "0"}, _ns(config="5")),
    ("config5_tile16",     {"PT_TPU_TILE_RIS": "1"},
     _ns(config="5", resample=16)),
    ("config5_tile32",     {"PT_TPU_TILE_RIS": "1"},
     _ns(config="5", resample=32)),
    ("config5_tile24",     {"PT_TPU_TILE_RIS": "1"},
     _ns(config="5", resample=24)),
    # K=48: candidate default if the trimmed estimator confirms tile-K32
    # is ~1.25x noisier than global-K64 (round-4 finding)
    ("config5_tile48",     {"PT_TPU_TILE_RIS": "1"},
     _ns(config="5", resample=48)),
    ("c5noise",            {}, _ns(config="c5noise")),
    # RIS defensive-mixture weight (round 4; needs the trimmed estimator)
    ("c5noise_d25",        {"PT_TPU_RIS_DEFENSIVE": "0.25"},
     _ns(config="c5noise")),
    # scalar-cond skip of the light-side eval on emitter vertices (round 4)
    ("config5_srcskip",    {"PT_TPU_C5_SRC_SKIP": "1"}, _ns(config="5")),
    # per-32-tri-block AABB gating in the streamed chunk sweep (round 3)
    ("stream_bgate_on",    {"PT_TPU_BLOCK_GATE": "1"},
     _ns(config="3", gen_tris=249000, spp=4)),
    ("stream_bgate_off",   {"PT_TPU_BLOCK_GATE": "0"},
     _ns(config="3", gen_tris=249000, spp=4)),
    # textured + vmem shapes ride the VMEM kernels (ungated) — re-rows
    # for the round-3 record at the new defaults
    ("tex50k_r3",          {}, _ns(config="3", gen_tris=50000,
                                   gen_tex=True, spp=16)),
    # round 4: the standalone-kernel 32-row tile default was measured on
    # the STREAMED mesh (culling-selectivity-bound); on VMEM tables the
    # megakernel's sweep said 128 rows ~1.5x over 32 (loop amortization).
    # The fused-tex tier + PPM eye pass + small scenes all ride these.
    ("tex50k_rows64",      {"PT_TPU_TILE_ROWS": "64"},
     _ns(config="3", gen_tris=50000, gen_tex=True, spp=16)),
    ("tex50k_rows128",     {"PT_TPU_TILE_ROWS": "128"},
     _ns(config="3", gen_tris=50000, gen_tex=True, spp=16)),
    ("ppm_rows128",        {"PT_TPU_TILE_ROWS": "128"},
     _ns(config="4", fast=True)),
    # streamed + textured together (round 4: never measured before) —
    # the with_uv stream kernel + atlas gather at the 327,680-tri shape
    ("tex250k",            {},
     _ns(config="3", gen_tris=249000, gen_tex=True, spp=4)),
    # VMEM-resident mesh tier: leaf 32 was never swept (64-vs-256 only)
    ("vmem100k_leaf32",    {"PT_TPU_LEAF_SIZE": "32"},
     _ns(config="3", gen_tris=100000, spp=16)),
    # honest VMEM-megakernel row: gen 100000 rounds UP to 327,680 tris
    # (above max_vmem_tris!) so the 'vmem100k' steps were actually
    # streaming — 80000 rounds to 81,920, genuinely VMEM-resident
    ("vmem80k",            {}, _ns(config="3", gen_tris=80000, spp=16)),
    # eye-megakernel tile height: 160 won +2% on the PT megakernel at
    # 1080p but was never measured on the BDPT eye kernel
    ("config5_rows160",    {"PT_TPU_MEGA_ROWS": "160"}, _ns(config="5")),
    # ---- round-5 steps ----
    # depth-slotted photon events (new default): the megakernel bins
    # deposits by depth into light_depth slots, halving the event tensor
    # the XLA sort/pack chews (VERDICT r4 item 1).  Cap fractions pinned
    # per side: 0.7-of-4-slots gathers the same absolute rows as the
    # round-4 0.35-of-8-slots.
    ("ppm_r5_depth",    {"PT_TPU_PPM_DEPTH_SLOTS": "1",
                         "PT_TPU_PPM_CAPFRAC": "0.7"},
     _ns(config="4", fast=True)),
    ("ppm_r5_iter",     {"PT_TPU_PPM_DEPTH_SLOTS": "0",
                         "PT_TPU_PPM_CAPFRAC": "0.35"},
     _ns(config="4", fast=True)),
    # re-attribution under the new layout (timing-only neuters)
    ("ppm_r5_no_gather", {"PT_TPU_PPM_NEUTER": "gather",
                          "PT_TPU_PPM_CAPFRAC": "0.7"},
     _ns(config="4", fast=True)),
    ("ppm_r5_no_kernel", {"PT_TPU_PPM_NEUTER": "kernel",
                          "PT_TPU_PPM_CAPFRAC": "0.7"},
     _ns(config="4", fast=True)),
    # pair-math SUB width re-sweep under the hp-sub-outer nest (VERDICT
    # r4 item 2: 16/32/64 were only swept under the OLD join order)
    ("ppm_sub8",        {"PT_TPU_PPM_SUB": "8",
                         "PT_TPU_PPM_CAPFRAC": "0.7"},
     _ns(config="4", fast=True)),
    ("ppm_sub32",       {"PT_TPU_PPM_SUB": "32",
                         "PT_TPU_PPM_CAPFRAC": "0.7"},
     _ns(config="4", fast=True)),
    ("ppm_sub64",       {"PT_TPU_PPM_SUB": "64",
                         "PT_TPU_PPM_CAPFRAC": "0.7"},
     _ns(config="4", fast=True)),
    ("ppm_r5_full",     {}, _ns(config="4")),
    # config3's honest shape (VERDICT r4 weak 3): the recorded textured
    # rows are all spp-16 sweep steps; one full spp-1024 row (~25 min)
    ("tex50k_honest1024", {}, _ns(config="3", gen_tris=50000,
                                  gen_tex=True, spp=1024)),
    # in-megakernel one-hot atlas fetch go/no-go (VERDICT r4 item 6)
    ("texprobe",          {}, _ns(config="texprobe")),
    # streamed-sweep roofline: exact-count no-cull core rate (item 4)
    ("streamroof",        {}, _ns(config="streamroof")),
]

_AB_KEYS = ("PT_TPU_SUBROWS", "PT_TPU_MEGA_ROWS", "PT_TPU_STREAM_TILE_ROWS",
            "PT_TPU_LEAF_SIZE", "PT_TPU_NO_PALLAS", "PT_TPU_NO_FUSED_SHADE",
            "PT_TPU_NO_MEGAKERNEL", "PT_TPU_DIR_BITS", "PT_TPU_SORT_TRIS",
            "PT_TPU_BDPT_NEUTER", "PT_TPU_PPM_NEUTER",
            "PT_TPU_STREAM_NEUTER", "PT_TPU_TILE_RIS",
            "PT_TPU_BLOCK_GATE", "PT_TPU_PPM_CPG", "PT_TPU_PPM_HP_OUTER",
            "PT_TPU_PPM_EVCHUNK", "PT_TPU_RIS_DEFENSIVE",
            "PT_TPU_C5_SRC_SKIP", "PT_TPU_NO_COMPACT",
            "PT_TPU_COMPACT_SMALL", "PT_TPU_NO_PHOTON_MEGA",
            "PT_TPU_TILE_ROWS", "PT_TPU_PPM_CAPFRAC",
            "PT_TPU_PPM_COLGATHER", "PT_TPU_PPM_DEPTH_SLOTS",
            "PT_TPU_PPM_SUB", "PT_TPU_NO_NATIVE")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-min", type=float, default=50.0,
                    help="stop starting new steps after this many minutes")
    ap.add_argument("--steps", default="",
                    help="comma-separated subset of step tags")
    ap.add_argument("--out", default="",
                    help="results file (default: a fresh per-run "
                         "/tmp/hw_measure/results-<runid>.jsonl — watcher "
                         "retries must not interleave rows with earlier "
                         "runs' in one file; ADVICE r2 item 5)")
    args = ap.parse_args()
    t_end = time.time() + args.deadline_min * 60
    want = [s for s in args.steps.split(",") if s]
    # validate tags BEFORE touching jax / acquiring the TPU grant: a typo
    # that dies after first contact wastes a multi-minute grant cycle
    # (ADVICE r4 item 1)
    known = {tag for tag, _env, _ns in STEPS}
    unknown = [t for t in want if t not in known]
    if unknown:
        print(f"unknown --steps tags: {', '.join(unknown)}\n"
              f"known tags: {', '.join(sorted(known))}", file=sys.stderr)
        return 2
    if not args.out:
        args.out = time.strftime(
            "/tmp/hw_measure/results-%Y%m%d-%H%M%S.jsonl")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    from path_tracing_tpu.runtime import setup_jax_cache
    setup_jax_cache()
    import jax
    import jax.numpy as jnp

    import bench

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    # patient first contact: wait out any lingering grant instead of
    # killing (a killed probe renews the wedge)
    t0 = time.time()
    s = float((jnp.ones((1024, 1024)) @ jnp.ones((1024, 1024))).sum())
    emit({"metric": "sweep: first-contact matmul", "value":
          round(time.time() - t0, 1), "unit": "s", "vs_baseline": 0,
          "note": f"sum={s}"})

    failures = 0
    prev_env: dict = {}
    by_tag = {tag: (tag, env, ns) for tag, env, ns in STEPS}
    # --steps runs in the GIVEN order (round 4: lets a sweep front-load
    # safe decision steps before brand-new kernels that might fault the
    # worker and kill the process's remaining steps)
    todo = [by_tag[t] for t in want] if want else STEPS
    for tag, env, ns in todo:
        if time.time() > t_end:
            emit({"metric": f"sweep: {tag}", "value": 0, "unit": "",
                  "vs_baseline": 0, "error": "deadline — not started"})
            failures += 1
            continue
        if env != prev_env:
            for k in _AB_KEYS:
                os.environ.pop(k, None)
            os.environ.update(env)
            jax.clear_caches()  # per-CLAUDE.md: traces cache per fn object
            prev_env = dict(env)
        t0 = time.time()
        try:
            rec = bench.run(ns)
            rec["step"] = tag
            rec["wall_s"] = round(time.time() - t0, 1)
            if env:
                rec["env"] = env
            emit(rec)
        except Exception as e:  # noqa: BLE001 — keep sweeping
            failures += 1
            emit({"metric": f"sweep: {tag}", "value": 0, "unit": "",
                  "vs_baseline": 0, "wall_s": round(time.time() - t0, 1),
                  "error": f"{type(e).__name__}: {e}"})
    emit({"metric": "sweep: done", "value": 1, "unit": "", "vs_baseline": 0,
          "failures": failures})
    # nonzero on any failed/unstarted step so tools/tpu_watch.sh keeps
    # watching and retries the unmeasured decision steps (ADVICE r2 item 2)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
