#!/bin/bash
# Poll the (currently wedged) tunneled TPU; the moment a trivial matmul
# answers, run the full hardware measurement runbook (tools/hw_measure.sh).
# Single instance guarded by a pid file.  Safe to leave running: every
# probe is timeout-bounded and the runbook self-bounds each step.
#
# Usage: tools/tpu_watch.sh [max_hours]      (default 11)
set -u
cd "$(dirname "$0")/.."
PIDF=/tmp/tpu_watch.pid
if [ -f "$PIDF" ] && kill -0 "$(cat "$PIDF")" 2>/dev/null; then
  echo "tpu_watch already running (pid $(cat "$PIDF"))"; exit 0
fi
echo $$ > "$PIDF"
MAXH="${1:-11}"
DEADLINE=$(( $(date +%s) + MAXH * 3600 ))
LOG=/tmp/tpu_watch.log
echo "tpu_watch start $(date -u +%H:%M:%S) deadline +${MAXH}h" >> "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  # 600s probe budget: after a long wedge the tunnel answers SLOWLY
  # (first revival took ~130s for a 1k matmul; a 150s budget then killed
  # the next probe mid-op, which is exactly how the chip re-wedges)
  if timeout 600 python -c "
import jax.numpy as jnp
x = jnp.ones((1024, 1024)); print('alive', float((x @ x).sum()))" \
      >> "$LOG" 2>&1; then
    echo "TPU ALIVE $(date -u +%H:%M:%S) — launching runbook" >> "$LOG"
    # single-process sweep: each fresh client pays a multi-minute
    # grant-release wait after the previous one exits, so per-step
    # subprocesses (hw_measure.sh) crawl; hw_sweep.py connects once
    python tools/hw_sweep.py --deadline-min 180 >> "$LOG" 2>&1
    rc=$?
    echo "runbook done rc=$rc $(date -u +%H:%M:%S)" >> "$LOG"
    if [ "$rc" -eq 0 ]; then rm -f "$PIDF"; exit 0; fi
    # runbook aborted (chip flaked mid-run): keep watching, retry later
  fi
  echo "still wedged $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 600
done
echo "tpu_watch deadline reached, giving up" >> "$LOG"
rm -f "$PIDF"
exit 1
