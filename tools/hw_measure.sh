#!/bin/bash
# Hardware measurement runbook — thin wrapper around the single-process
# sweep driver (tools/hw_sweep.py).
#
# This used to run one `python bench.py` subprocess per step; that design
# is RETIRED: through this environment's tunneled TPU every fresh client
# waits minutes for the previous client's grant to release, so per-step
# subprocesses crawl (and their stale per-step env knobs mislabeled the
# round-2 stream A/B — ADVICE r2 item 1).  hw_sweep.py connects once and
# toggles the A/B envs in-process with jax.clear_caches().
#
# Usage:  tools/hw_measure.sh [logdir]     (default /tmp/hw_measure)
# One-shot; safe to re-run.  Watch with:  tail -f /tmp/hw_measure/run.log
set -u
cd "$(dirname "$0")/.."
D="${1:-/tmp/hw_measure}"
mkdir -p "$D"
LOG="$D/run.log"

echo "=== liveness probe [$(date +%H:%M:%S)] ===" | tee -a "$LOG"
timeout 600 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); x=jnp.ones((1024,1024)); s=float((x@x).sum())
print('TPU OK sum', s, 'dt', time.time()-t0)" >> "$LOG" 2>&1 || {
  echo "=== chip unreachable — aborting [$(date +%H:%M:%S)] ===" | tee -a "$LOG"
  exit 1; }

echo "=== sweep start [$(date +%H:%M:%S)] ===" | tee -a "$LOG"
python tools/hw_sweep.py --deadline-min 180 >> "$LOG" 2>&1
rc=$?
echo "=== sweep done rc=$rc [$(date +%H:%M:%S)] ===" | tee -a "$LOG"
exit $rc
