#!/bin/bash
# Hardware measurement runbook: run the full BASELINE sweep + pending A/Bs
# the moment the TPU is reachable.  Every step is timeout-bounded (a hung
# step through the tunnel is how the chip gets wedged) and appends to
# $LOG; steps are ordered cheapest-first so a mid-run wedge still leaves
# the headline numbers on disk.
#
# Usage:  tools/hw_measure.sh [logdir]     (default /tmp/hw_measure)
# One-shot; safe to re-run.  Watch with:  tail -f /tmp/hw_measure/run.log
set -u
cd "$(dirname "$0")/.."
D="${1:-/tmp/hw_measure}"
mkdir -p "$D"
LOG="$D/run.log"

say() { echo "=== $* [$(date +%H:%M:%S)] ===" | tee -a "$LOG"; }
run() { # run <tag> <timeout-s> <cmd...>
  local tag="$1" to="$2"; shift 2
  # clean mid-run stop: `touch $D/STOP` halts BETWEEN steps (never kill a
  # TPU process mid-op — that wedges the chip)
  if [ -f "$D/STOP" ]; then say "STOP file present — halting cleanly"; exit 0; fi
  say "$tag"
  # PT_TPU_BENCH_PROBE=600: consecutive steps each reconnect through the
  # tunnel, and the grant from the PREVIOUS step's exit takes minutes to
  # release — a short probe budget here kills the probe mid-wait, which
  # re-wedges the chip (observed 2026-08-19)
  PT_TPU_BENCH_PROBE=600 timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $tag rc=$rc" | tee -a "$LOG"
  # incremental results: a partial run (session end, mid-run wedge) must
  # still leave every completed step's JSON line on disk
  grep -h '"metric"' "$LOG" > "$D/results.jsonl" 2>/dev/null
  return $rc
}

say "liveness probe"
timeout 600 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); x=jnp.ones((1024,1024)); s=float((x@x).sum())
print('TPU OK sum', s, 'dt', time.time()-t0)" >> "$LOG" 2>&1 || {
  say "chip unreachable — aborting"; exit 1; }

# DECISION-CRITICAL steps first (pending A/Bs gate code defaults):
# headline, then the PPM EV_ROWS check, then the streaming-sweep backend.
run "bench headline (config0)"   1800 python bench.py

# PPM A/B: current kernel (EV_ROWS=14 pad row + register chunk partials)
# vs round-1 measured 1.03 Mphotons/s on the same 1-pass shape.  If this
# regresses, the pad-row DMA lost — revert EV_ROWS to 13 per CLAUDE.md.
run "config4 PPM fast (1 pass)"  2400 python bench.py --config 4 --fast

# streaming sweep A/B at 249k tris (round-2 pending measurement):
#   A = MXU sweep HIGHEST (round-1 default, measured 0.63)
#   B = MXU sweep default precision
#   C = VPU sweep backend (round-2, bit-identical to _mt_core)
run "stream C: vpu sweep"        2400 env PT_TPU_STREAM_SWEEP=vpu python bench.py --config 3 --gen-tris 249000 --spp 4
run "stream B: mxu MT_FAST"      2400 env PT_TPU_MT_FAST=1 python bench.py --config 3 --gen-tris 249000 --spp 4
run "stream A: mxu HIGHEST"      2400 python bench.py --config 3 --gen-tris 249000 --spp 4

run "config2 mis_test spp256"    1800 python bench.py --config 2
run "config5 BDPT RIS (default)" 2400 python bench.py --config 5
run "config1 oracle"             1800 python bench.py --config 1
# eye-megakernel tile-height A/B (160 was only ever measured on the PT
# megakernel; bdpt_eye stays 128 until this says otherwise)
run "config5 RIS rows=160"       2400 env PT_TPU_MEGA_ROWS=160 python bench.py --config 5

# bench.py's internal watchdog defaults to 2400s — raise it to match the
# step budget or it os._exit(3)s the honest 10-pass shape at 2400s.
run "config4 PPM full (10x1M)"   3600 env PT_TPU_BENCH_TIMEOUT=3500 \
    python bench.py --config 4

# textured fast tier (round-2: fused Pallas shade + batched atlas gather)
run "config3 textured 50k"       2400 python bench.py --config 3 --gen-tris 50000 --gen-tex --spp 16
# VMEM-resident untextured megakernel reference point
run "config3 vmem 100k"          2400 python bench.py --config 3 --gen-tris 100000 --spp 16

# config5 exact-sweep reference (RIS denominator for the 11x claim)
run "config5 exact sweep 512^2"  2400 python bench.py --config 5 --resample 0 --res 512x512

# BASELINE's second metric: time-to-target-RMSE.  --regen-rmse-target
# first: the committed 128^2 converged-oracle fixture predates the
# dist-scaled connection-MIS parity fix (the oracle brightened ~4%)
run "rmse time-to-target (regen)" 3600 env PT_TPU_BENCH_TIMEOUT=3500 \
    python bench.py --config rmse --regen-rmse-target

# profiler trace of the headline shape — raw material for the next
# optimization round (where do the megakernel's cycles actually go)
run "headline profile trace"     1800 python -m path_tracing_tpu.cli \
    --input /root/reference/mis_test.txt --mode pt --spp 4 \
    --width 1920 --height 1080 --iters 2 --profile "$D/trace" \
    --output "$D/profile_frame.png"

# TPU-gated test suites last (longest, least perishable)
run "TPU-gated pallas+golden"    5400 env PT_TPU_TESTS_ON_TPU=1 PT_TPU_GOLDEN=1 \
    python -m pytest tests/test_pallas.py tests/test_golden.py -q

say "ALL DONE"
grep -h '"metric"' "$LOG" | tee "$D/results.jsonl"
