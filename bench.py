"""Benchmarks for the BASELINE.md configs.

Default (no args): the headline — Mpaths/sec/chip at 1080p unidirectional PT
(north star >= 100 on v5p; vs_baseline = value / 100).  Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "Mpaths/s", "vs_baseline": N}

``--config N`` runs one of the five BASELINE configs (each prints its own
single JSON line).  Defaults are the HONEST BASELINE shapes (config 2 spp
256, config 3 spp 1024, config 4 ten 1M-photon passes); ``--spp``/``--fast``
shrink them for smoke runs:
  1  deterministic BDPT oracle, input.txt, 256x256, 16 spp (ground truth)
  2  PT + NEE + MIS, mis_test.txt, 512x512, 256 spp
  3  OBJ mesh + clusters, 1080p PT, 1024 spp (sphere fixture unless --obj)
  4  PPM, input.txt, 512x512, 10 passes x 1M photons
  5  BDPT, input.txt, 1080p, RIS light-vertex resampling K=64 (the measured
     winner; --resample 0 --res 512x512 recovers the exact all-pairs sweep)

Robustness contract with the driver (VERDICT round 1 item 1b): this script
ALWAYS prints exactly one JSON line.  On any error it retries once after
``jax.clear_caches()``; if the retry also fails, the line carries an
``"error"`` field.  A watchdog thread hard-exits (after printing the error
line) if the whole run exceeds PT_TPU_BENCH_TIMEOUT seconds (default 2400)
— a wedged tunneled TPU otherwise hangs forever inside a host read that no
signal can interrupt.

NOTE: ``block_until_ready`` does not actually block through this
environment's tunneled TPU; every timed region ends with a scalar host read.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

_EMIT_LOCK = threading.Lock()
_RESULT_PRINTED = False
# chip-speed calibration measured by the liveness probe (VERDICT r4 weak 6:
# without it, BENCH_r*.json cannot separate the documented ±10-15%
# session/chip drift from a real code regression).  Filled in by _probe.
_CALIBRATION: dict = {}


def _emit(rec: dict) -> None:
    # atomic test-and-set: the watchdog thread and the main thread can race
    # to print; the exactly-one-JSON-line contract must hold either way
    global _RESULT_PRINTED
    with _EMIT_LOCK:
        if _RESULT_PRINTED:
            return
        _RESULT_PRINTED = True
    rec = {**rec, **_CALIBRATION}
    print(json.dumps(rec), flush=True)


def _sync(x) -> float:
    return float(x.sum())


def _timeit(fn, iters=3):
    _sync(fn(0))  # compile + warm
    t0 = time.perf_counter()
    for i in range(iters):
        _sync(fn(i + 1))
    return (time.perf_counter() - t0) / iters


def run(args) -> dict:
    """Run the selected config and return the result record."""
    import jax

    from path_tracing_tpu.runtime import setup_jax_cache
    setup_jax_cache()

    from path_tracing_tpu.config import RenderConfig
    from path_tracing_tpu.scene.camera import make_camera
    from path_tracing_tpu.scene.obj_loader import load_any_scene

    key = jax.random.PRNGKey(0)

    def setup(path, W, H, **cfg_kw):
        p = load_any_scene(path)
        scene = p.to_device()
        cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
        return scene, cam, RenderConfig(width=W, height=H, **cfg_kw)

    if args.config == "rmse":
        # BASELINE's second metric: wall seconds for a fresh progressive
        # BDPT render to reach 8-bit RMSE < 13 against a converged
        # deterministic oracle (committed fixture; --regen-rmse-target
        # rebuilds it by averaging 256 independent oracle-mode passes).
        import numpy as np

        from path_tracing_tpu.film import tonemap_u8
        from path_tracing_tpu.integrators.bdpt import render_bdpt

        W = H = 128
        scene, cam, cfg = setup("/root/reference/input.txt", W, H,
                                eye_depth=4, light_depth=4, delta_budget=4)
        # progressive estimator: oracle mode (the GPU-parity estimator
        # differs from the oracle by the dielectric shadow rule and
        # plateaus at ~22 RMSE — a real reference property, not noise)
        f = lambda k, i: render_bdpt(scene, cam, W, H, 4, 16, cfg,
                                     jax.random.fold_in(k, i), oracle=True)
        fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tests", "fixtures", "rmse_target_128.npy")
        if args.regen_rmse_target or not os.path.exists(fixture):
            print("regenerating converged target (256 passes)...",
                  file=sys.stderr)
            tkey = jax.random.PRNGKey(0xA5A5)  # disjoint from measure keys
            tacc = np.zeros((W * H, 3))
            for i in range(256):
                tacc += np.asarray(f(tkey, i))
            np.save(fixture, (tacc / 256).astype(np.float32))
        target = tonemap_u8(np.load(fixture), W, H).astype(np.float32)

        _sync(f(key, 0))  # warm compile outside the timed region
        acc = np.zeros((W * H, 3))
        t0 = time.perf_counter()
        rmse = 1e9
        for i in range(1, 129):
            img = f(key, i)
            _sync(img)
            acc += np.asarray(img)
            u8 = tonemap_u8(acc / i, W, H)
            rmse = float(np.sqrt(np.mean(
                (u8.astype(np.float32) - target) ** 2)))
            if rmse < 13.0:
                break
        dt = time.perf_counter() - t0
        return {
            "metric": f"time-to-RMSE<13 (8-bit) vs converged oracle, BDPT "
                      f"128^2 (reached {rmse:.1f} after {i} passes)",
            "value": round(dt, 2), "unit": "s",
            "vs_baseline": round(dt / 60.0, 4)}

    if args.config == "golden":
        # golden-image parity ON HARDWARE: the same render as
        # tests/test_golden.py (200^2 spp8 spl8 BDPT vs the reference's
        # committed output.png), reported as the exact 8-bit RMSE so every
        # sweep session refreshes the number (VERDICT r2 item 5)
        import numpy as np

        from path_tracing_tpu.film import read_png, tonemap_u8
        from path_tracing_tpu.integrators.bdpt import render_bdpt

        W = H = 200
        scene, cam, cfg = setup("/root/reference/input.txt", W, H,
                                delta_budget=4)
        img = np.asarray(render_bdpt(scene, cam, W, H, 8, 8, cfg,
                                     jax.random.PRNGKey(0)))
        u8 = tonemap_u8(img, W, H)
        g = read_png("/root/reference/output.png").astype(np.float32)
        rmse = float(np.sqrt(np.mean((g - u8.astype(np.float32)) ** 2)))
        return {"metric": "golden-image 8-bit RMSE vs reference output.png "
                          "(200^2 BDPT spp8 spl8)",
                "value": round(rmse, 2), "unit": "rmse",
                "vs_baseline": round(rmse / 20.0, 4)}

    if args.config == "c5noise":
        # config5 estimator QUALITY: per-pixel noise level (RMS of the
        # half-difference of two independent seeds, clipped to display
        # range) for the RIS variants, same shape/budget each.  Decides
        # whether tile-local RIS at a smaller K matches global K=64 —
        # the speed claim is only honest at matched noise.
        import numpy as np

        from path_tracing_tpu.integrators.bdpt import render_bdpt

        W = H = 256
        spp = args.spp or 8
        scene, cam, cfg = setup("/root/reference/input.txt", W, H,
                                delta_budget=4)

        def noise(k_res, tile):
            # mean over 6 independent seed PAIRS: a single half-difference
            # RMS is itself noisy under firefly outliers (measured: 3
            # pairs still ranked K=24 above K=16 — inconsistent with
            # monotonicity in K, i.e. estimator noise ~ +-0.03).
            # Round 4: TRIMMED RMS — the top 0.1% of squared half-diffs
            # (isolated fireflies, variance dominated by a handful of
            # pixels even after the display clip) are dropped per pair,
            # which is what stabilized the r3 estimator's +-0.015 spread
            # enough to rank K values monotonically.
            # Round 5 (VERDICT r4 weak 8): ALSO computes the same trimmed
            # RMS on LINEAR HDR radiance (no display clip) from the same
            # renders — the clip truncates K=16's fireflies
            # non-monotonically, breaking the metric exactly where the
            # K-curve gets interesting.  Returns (clipped, linear).
            os.environ["PT_TPU_TILE_RIS"] = "1" if tile else "0"
            jax.clear_caches()
            c2 = cfg.with_(bdpt_resample_vertices=k_res)
            f = jax.jit(lambda key: render_bdpt(
                scene, cam, W, H, spp, 8, c2, key))
            tot = tot_lin = 0.0
            pairs = (11, 33, 55, 77, 99, 121)

            def trimmed_rms(a, b):
                sq = np.square(a - b).ravel()
                keep = max(1, int(sq.size * 0.999))
                return float(np.sqrt(
                    np.mean(np.partition(sq, keep - 1)[:keep]) / 2.0))

            for s in pairs:
                a = np.asarray(f(jax.random.PRNGKey(s)))
                b = np.asarray(f(jax.random.PRNGKey(s + 11)))
                tot += trimmed_rms(np.clip(a, 0, 1), np.clip(b, 0, 1))
                tot_lin += trimmed_rms(a, b)
            return tot / len(pairs), tot_lin / len(pairs)

        try:
            n_g64, l_g64 = noise(64, False)
            n_t64, l_t64 = noise(64, True)
            n_t16, l_t16 = noise(16, True)
            n_t24, l_t24 = noise(24, True)
            n_t32, l_t32 = noise(32, True)
            n_t48, l_t48 = noise(48, True)
        finally:
            os.environ.pop("PT_TPU_TILE_RIS", None)
        return {"metric": f"config5 RIS noise (256^2 spp{spp}; 0.1%-trimmed"
                          " RMS half-diff, 6 seed pairs): tile-K32 / "
                          "global-K64",
                "value": round(n_t32 / max(n_g64, 1e-9), 3), "unit": "x",
                "vs_baseline": round(n_t32 / max(n_g64, 1e-9), 3),
                "noise_global64": round(n_g64, 5),
                "noise_tile64": round(n_t64, 5),
                "noise_tile48": round(n_t48, 5),
                "noise_tile32": round(n_t32, 5),
                "noise_tile24": round(n_t24, 5),
                "noise_tile16": round(n_t16, 5),
                "lin_global64": round(l_g64, 5),
                "lin_tile64": round(l_t64, 5),
                "lin_tile48": round(l_t48, 5),
                "lin_tile32": round(l_t32, 5),
                "lin_tile24": round(l_t24, 5),
                "lin_tile16": round(l_t16, 5)}

    if args.config == "texprobe":
        # VERDICT r4 item 6 go/no-go probe: time the in-megakernel one-hot
        # MXU atlas fetch (the only Mosaic-legal per-lane gather) at
        # candidate atlas sizes.  Per tile-row of 128 rays the fetch is
        # "build onehot (Dc,128) chunks from the ray's flat texel index,
        # accumulate (12, Dc) @ (Dc, 128)" — 12 = 4 bilinear taps x RGB.
        # The viability bar: the megakernel's measured tile-bounce budget
        # is ~1.1 ms (1080p, 128-row tiles, 1.86 Mpaths/s untextured), so
        # the fetch must cost <~10% of that across a tile's 128 rows.
        import jax.numpy as jnp
        import numpy as np

        from path_tracing_tpu.ops.pallas_intersect import interp_forced
        from path_tracing_tpu.ops.probes import onehot_fetch

        rows = 128
        res = {}
        for d_name, D in (("64sq", 4352), ("128sq", 16640),
                          ("256sq", 66048)):
            DC = 512
            tab = jnp.asarray(
                np.random.RandomState(0).rand(12, D), jnp.float32)
            idx = jnp.asarray(np.random.RandomState(1).randint(
                0, D, size=(rows, 128)), jnp.int32)
            f = onehot_fetch(rows, D, DC, interpret=interp_forced())
            # sub-ms kernel vs ~40 ms tunnel dispatch: amortize over REPS
            # kernel invocations inside ONE jit (index varies per rep so
            # XLA cannot CSE the calls)
            REPS = 64

            def g(t, i):
                def body(k, acc):
                    out = f(t, (i + k) % D)
                    return acc + out[0, 0]
                return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

            gj = jax.jit(g)
            _sync(gj(tab, idx))  # compile + warm
            t0 = time.perf_counter()
            _sync(gj(tab, idx))
            dt = (time.perf_counter() - t0) / REPS
            res[f"fetch_ms_tile_{d_name}"] = round(dt * 1e3, 3)
        # overhead fraction vs the measured ~1.1 ms tile-bounce budget
        frac = res["fetch_ms_tile_64sq"] / 1.1
        return {"metric": "in-megakernel one-hot atlas fetch, ms per "
                          "128-row tile (12 outputs = 4 taps x RGB)",
                "value": res["fetch_ms_tile_64sq"], "unit": "ms",
                "vs_baseline": round(frac, 3), **res}

    if args.config == "streamroof":
        # VERDICT r4 item 4: roofline the streamed triangle sweep.  With
        # PT_TPU_STREAM_NOCULL=1 every tile enters every cluster, so the
        # test count is EXACT (rays x padded tri slots) and the measured
        # wall prices the sweep core (DMA + _mt_core VPU arithmetic) with
        # no culling unknowns.  ~41 VPU f32 ops per Moller-Trumbore test
        # in the _mt_core form (edges precomputed at pack time).
        import jax.numpy as jnp
        import numpy as np

        from path_tracing_tpu.ops.pallas_intersect import (
            nearest_hit_pallas)
        from path_tracing_tpu.scene.synth import icosphere_scene

        os.environ["PT_TPU_STREAM_NOCULL"] = "1"
        # the per-32-tri block gate (default ON) would still skip blocks
        # behind the carried best hit, breaking the exact count (review
        # r5 — the first recorded 19.24 Gtests/s row was inflated by it)
        os.environ["PT_TPU_BLOCK_GATE"] = "0"
        try:
            jax.clear_caches()
            p = icosphere_scene(5000)
            scene = p.to_device()
            # exact padded-slot count: the VPU sweep rounds each cluster
            # to whole 8-triangle slot rows
            cr = np.asarray(scene.tri_cluster_range)
            nt_pad = int((np.ceil(cr[:, 1] / 8) * 8).sum())
            B = 512 * 512
            rs = np.random.RandomState(5)
            ro = jnp.asarray(rs.uniform(-0.1, 0.1, (B, 3)), jnp.float32)
            rd = rs.normal(size=(B, 3)).astype(np.float32)
            rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
            rd = jnp.asarray(rd)

            f = jax.jit(lambda a, b: nearest_hit_pallas(
                scene, a, b, force_stream=True)["t"])
            _sync(f(ro, rd))  # compile + warm
            t0 = time.perf_counter()
            reps = 5
            for i in range(reps):
                _sync(f(ro, rd))
            dt = (time.perf_counter() - t0) / reps
        finally:
            os.environ.pop("PT_TPU_STREAM_NOCULL", None)
            os.environ.pop("PT_TPU_BLOCK_GATE", None)
        tests = B * nt_pad
        rate = tests / dt / 1e9
        # VPU f32 peak (assumption, documented): ~4 ALU ops x (8,128)
        # vregs x ~1.75 GHz ~= 7.2 Tops -> ~175 Gtests/s at 41 ops/test
        peak_tests = 7.2e12 / 41 / 1e9
        return {"metric": f"streamed sweep core, no-cull exact-count "
                          f"({B} rays x {nt_pad} padded tri slots)",
                "value": round(rate, 2), "unit": "Gtests/s",
                "vs_baseline": round(rate / peak_tests, 3),
                "wall_s_per_call": round(dt, 3),
                "est_vpu_peak_gtests": round(peak_tests, 1),
                "est_ops_per_test": 41}

    c = int(args.config)
    if c in (0, 2, 3):
        from path_tracing_tpu.integrators.pt import render_pt

        if c == 3:
            W, H, spp = 1920, 1080, args.spp or 1024
            if args.gen_tris:
                from path_tracing_tpu.scene.synth import icosphere_scene

                p = icosphere_scene(args.gen_tris, textured=args.gen_tex)
                scene = p.to_device()
                cam = make_camera(p.eye, p.look_at, p.view_up, p.fov, W, H)
                cfg = RenderConfig(width=W, height=H, eye_depth=4,
                                   delta_budget=4)
                kind = "synthetic icosphere" + (" textured" if args.gen_tex
                                                else "")
            else:
                scene, cam, cfg = setup(args.obj, W, H, eye_depth=4,
                                        delta_budget=4)
                kind = "OBJ mesh" + (" textured" if scene.has_textures
                                     else "")
            name = (f"config3 1080p PT over {kind} "
                    f"({scene.num_triangles} tris, clustered), spp={spp}")
        elif c == 2:
            W, H, spp = 512, 512, args.spp or 256
            scene, cam, cfg = setup("/root/reference/mis_test.txt", W, H,
                                    eye_depth=4, delta_budget=4)
            name = f"config2 PT+NEE+MIS mis_test 512^2 spp={spp}"
        else:
            W, H, spp = 1920, 1080, args.spp or 4
            path = args.scene or "/root/reference/mis_test.txt"
            scene, cam, cfg = setup(path, W, H, eye_depth=4, delta_budget=4)
            sname = os.path.basename(path)
            name = (f"1080p unidirectional PT (NEE+MIS), {sname}, "
                    f"spp={spp}, eye_depth=4")
        # big shapes: one timed pass is plenty (the estimator is a spp loop)
        iters = 1 if W * H * spp > 600_000_000 else 3
        # bound the PER-LAUNCH path count: a single XLA execution running
        # tens of minutes crashes the TPU worker (measured round 5: the
        # honest textured spp-1024 row faulted at launch ~20 min, while
        # the same shape at spp 16 is fine).  Chunk the spp loop into
        # bounded launches — identical estimator, per-launch ~<1 min.
        chunk = spp
        if W * H * spp > 600_000_000:
            for cand in (16, 8, 4, 2, 1):
                if spp % cand == 0:
                    chunk = cand
                    break

        if chunk == spp:
            dt = _timeit(lambda i: render_pt(scene, cam, W, H, spp, cfg,
                                             jax.random.fold_in(key, i)),
                         iters=iters)
        else:
            # warm/compile with ONE chunk launch, then time the full
            # chunked accumulation once (the loop reuses the compiled fn)
            _sync(render_pt(scene, cam, W, H, chunk, cfg,
                            jax.random.fold_in(key, 0)))
            t0 = time.perf_counter()
            acc = None
            for j in range(spp // chunk):
                img = render_pt(scene, cam, W, H, chunk, cfg,
                                jax.random.fold_in(key, j + 1))
                acc = img if acc is None else acc + img
            _sync(acc)
            dt = time.perf_counter() - t0
        val = W * H * spp / dt / 1e6
        rec = {"metric": name, "value": round(val, 3), "unit": "Mpaths/s",
               "vs_baseline": round(val / 100.0, 4)}
        if chunk != spp:
            rec["chunked_spp"] = chunk
        return rec
    elif c == 1:
        from path_tracing_tpu.integrators.bdpt import render_oracle

        W = H = 256
        scene, cam, cfg = setup("/root/reference/input.txt", W, H,
                                eye_depth=4, light_depth=4, delta_budget=4)
        dt = _timeit(lambda i: render_oracle(scene, cam, W, H, 16, 8, cfg,
                                             seed=1337), iters=1)
        val = W * H * 16 / dt / 1e6
        return {"metric": "config1 BDPT oracle input.txt 256^2 "
                          "spp=16 spl=8 (deterministic)",
                "value": round(val, 3), "unit": "Mpaths/s",
                "vs_baseline": round(val / 100.0, 4)}
    elif c == 4:
        import numpy as np

        from path_tracing_tpu.integrators.ppm import render_ppm_with_stats

        W = H = 512
        photons = 1_000_000
        passes = 1 if args.fast else 10  # BASELINE: 10 passes x 1M photons
        # the event cap is an explicit opt-in; the overflow counter is
        # checked after every pass so a drifted validity fraction fails
        # loudly instead of silently biasing the render (ADVICE r1).
        # Round 5: the photon megakernel emits DEPTH-SLOTTED events
        # (light_depth=4 slots instead of max_light_iters=8), so E halved
        # and the valid fraction doubled to ~0.62 — cap 0.7 gathers the
        # SAME absolute rows the round-4 0.35-of-8-slots cap did, with
        # the same ~13% headroom.  PT_TPU_PPM_CAPFRAC sweeps it.
        cap = float(os.environ.get("PT_TPU_PPM_CAPFRAC", "0.7"))
        scene, cam, cfg = setup("/root/reference/input.txt", W, H,
                                eye_depth=4, light_depth=4, delta_budget=4,
                                ppm_max_per_cell=128, ppm_cell_samples=32,
                                ppm_event_cap_frac=cap)
        spl = photons // max(scene.num_lights, 1)

        class CapOverflow(RuntimeError):
            """Event cap overflow — distinct from device RuntimeErrors
            (jaxlib's XlaRuntimeError is a RuntimeError subclass; a fault
            during warm must NOT be misdiagnosed as cap headroom)."""

        def one_pass(i):
            img, _count, overflow = render_ppm_with_stats(
                scene, cam, W, H, spl, cfg, jax.random.fold_in(key, i))
            ov = int(overflow)
            if ov != 0:
                raise CapOverflow(
                    f"PPM event cap overflowed ({ov} events dropped) — "
                    f"capped gather is no longer exact at this scene/shape")
            return img

        cap_fallback = False
        try:
            _sync(one_pass(0))  # compile + warm + overflow check
        except CapOverflow:
            # ADVICE r4: the default cap has only ~13% headroom over the
            # measured valid fraction — a seed/scene shift must fall back
            # to the always-exact full gather (cap 1.0, just slower)
            # instead of killing the benchmark.  The emitted record
            # carries the cap actually used so rows stay comparable.
            cap, cap_fallback = 1.0, True
            cfg = cfg.with_(ppm_event_cap_frac=cap)
            jax.clear_caches()
            _sync(one_pass(0))
        t0 = time.perf_counter()
        acc = None
        for i in range(passes):
            img = one_pass(i + 1)
            acc = img if acc is None else acc + img
        _sync(acc)
        dt = time.perf_counter() - t0
        val = photons * passes / dt / 1e6
        rec = {"metric": f"config4 PPM input.txt 512^2, {passes} pass(es) "
                         f"x 1M photons, overflow=0",
               "value": round(val, 3), "unit": "Mphotons/s",
               "vs_baseline": round(val / 100.0, 4),
               "event_cap_frac": cap}
        if cap_fallback:
            rec["event_cap_fallback"] = True
        return rec
    elif c == 5:
        from path_tracing_tpu.integrators.bdpt import render_bdpt

        W, H = (1920, 1080) if not args.res else tuple(
            int(v) for v in args.res.split("x"))
        spp, spl = args.spp or 4, 8
        # default: unbiased TILE-LOCAL RIS at K=32 — measured noise parity
        # with the round-2 global K=64 table (pooled over 3 hardware
        # sessions x up to 6 seed pairs: tile-K32 0.091/0.092/0.114 vs
        # global-K64 0.105/0.101/0.092 — equal within the half-diff
        # estimator's own ~+-0.015 firefly spread; K=24/16 are clearly
        # noisier) at 1.9x the speed (2.77 vs 1.44 Mpaths/s at 1080p).
        # --resample 0 recovers the exact all-pairs sweep.
        resample = 32 if args.resample is None else args.resample
        scene, cam, cfg = setup("/root/reference/input.txt", W, H,
                                eye_depth=4, light_depth=4, delta_budget=4,
                                bdpt_connection_samples=args.conn_samples,
                                bdpt_resample_vertices=resample)
        dt = _timeit(lambda i: render_bdpt(scene, cam, W, H, spp, spl, cfg,
                                           jax.random.fold_in(key, i)),
                     iters=2)
        val = W * H * spp / dt / 1e6
        cs, rs = args.conn_samples, resample
        return {"metric": f"config5 BDPT input.txt {W}x{H} spp={spp} "
                          f"spl={spl}"
                          + (f" conn_samples={cs}" if cs else "")
                          + (f" resample_K={rs}" if rs else ""),
                "value": round(val, 3), "unit": "Mpaths/s",
                "vs_baseline": round(val / 100.0, 4)}
    raise ValueError(f"unknown config {args.config!r}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="0",
                    help="0 = headline 1080p PT; 1-5 = BASELINE configs; "
                         "'rmse' = time-to-target-RMSE vs the oracle; "
                         "'golden' = 8-bit RMSE vs the reference's "
                         "committed output.png")
    ap.add_argument("--scene", default="",
                    help="config 0: scene file override (default "
                         "mis_test.txt; input.txt guards against masked-"
                         "contribution perf regressions — VERDICT r2 "
                         "item 8)")
    ap.add_argument("--obj", default="tests/fixtures/sphere.obj")
    ap.add_argument("--gen-tris", type=int, default=0,
                    help="config 3: render a synthetic icosphere with >= N "
                         "triangles instead of --obj (reproducible big-mesh "
                         "benchmark; >131072 exercises the HBM-streaming "
                         "kernels)")
    ap.add_argument("--gen-tex", action="store_true",
                    help="config 3 with --gen-tris: add spherical UVs + a "
                         "checker texture (the textured-mesh benchmark)")
    ap.add_argument("--spp", type=int, default=0)
    ap.add_argument("--res", default="",
                    help="config 5: WxH override (e.g. 1920x1080)")
    ap.add_argument("--fast", action="store_true",
                    help="shrink honest BASELINE shapes for smoke runs")
    ap.add_argument("--conn-samples", type=int, default=0,
                    help="config 5: unbiased per-eye-vertex connection "
                         "subsample (0 = exact all-pairs)")
    ap.add_argument("--resample", type=int, default=None,
                    help="config 5: importance-cull the light-vertex table "
                         "to K rows by unbiased RIS resampling (0 = full "
                         "table; default 64)")
    ap.add_argument("--regen-rmse-target", action="store_true",
                    help="rebuild the committed converged-oracle fixture "
                         "used by --config rmse")
    args = ap.parse_args()

    budget = float(os.environ.get("PT_TPU_BENCH_TIMEOUT", "2400"))

    def watchdog():
        _emit({"metric": f"bench --config {args.config}", "value": 0,
               "unit": "", "vs_baseline": 0,
               "error": f"watchdog: exceeded {budget:.0f}s "
                        f"(TPU hang / wedged chip?)"})
        os._exit(3)

    t = threading.Timer(budget, watchdog)
    t.daemon = True
    t.start()

    # fast liveness probe: a wedged chip (dead client's grant lingering on
    # the remote side) hangs EVERY op, including backend init — detect it in
    # minutes instead of burning the whole watchdog budget.  A healthy chip
    # answers the 1024^2 matmul in seconds (incl. first-connect).
    # 600s default (matches tools/hw_measure.sh and tools/tpu_watch.sh):
    # after ANY previous client disconnect (clean or killed) the tunnel
    # takes minutes to release its grant — 171 s measured after a clean
    # exit, 10+ min after a mid-op kill — and a probe killed mid-wait
    # re-wedges the chip (ADVICE r2)
    probe_budget = float(os.environ.get("PT_TPU_BENCH_PROBE", "600"))
    if probe_budget > 0:
        box: list = []

        def _probe():
            try:
                # apply the cpu-env -> config translation BEFORE first
                # backend use: the env forms still initialize the axon
                # plugin (which hangs while the chip is wedged)
                from path_tracing_tpu.runtime import setup_jax_cache
                setup_jax_cache()
                import jax
                import jax.numpy as jnp
                t0 = time.perf_counter()
                x = jnp.ones((1024, 1024))
                box.append(float((x @ x).sum()))
                _CALIBRATION["first_contact_s"] = round(
                    time.perf_counter() - t0, 1)
                # chip-speed calibration: 100 chained 4096^2 bf16 matmuls
                # inside ONE jit (~13.7 TFLOP — compute-bound, so the
                # ~40 ms tunnel RTT is noise).  a/4096 is a fixed point of
                # a @ a, so the chain can't overflow.
                a = jnp.full((4096, 4096), 1.0 / 4096, jnp.bfloat16)
                f = jax.jit(lambda a: jax.lax.fori_loop(
                    0, 100, lambda i, x: x @ a, a))
                float(f(a).sum())  # compile + warm
                t0 = time.perf_counter()
                float(f(a).sum())
                dt = time.perf_counter() - t0
                _CALIBRATION["calibration_tflops"] = round(
                    100 * 2 * 4096**3 / dt / 1e12, 1)
            except Exception as e:  # noqa: BLE001
                box.append(e)

        pt = threading.Thread(target=_probe, daemon=True)
        pt.start()
        pt.join(probe_budget)
        if not box:
            _emit({"metric": f"bench --config {args.config}", "value": 0,
                   "unit": "", "vs_baseline": 0,
                   "error": f"liveness probe: trivial matmul hung "
                            f">{probe_budget:.0f}s — TPU wedged "
                            f"(lingering grant); retry after it expires"})
            os._exit(2)

    err = None
    for attempt in range(2):
        try:
            rec = run(args)
            _emit(rec)
            return 0
        except Exception as e:  # noqa: BLE001 — the contract is one JSON line
            err = f"{type(e).__name__}: {e}"
            print(f"bench attempt {attempt} failed: {err}", file=sys.stderr)
            try:
                import jax
                jax.clear_caches()
            except Exception:
                pass
    _emit({"metric": f"bench --config {args.config}", "value": 0, "unit": "",
           "vs_baseline": 0, "error": err})
    return 1


if __name__ == "__main__":
    sys.exit(main())
