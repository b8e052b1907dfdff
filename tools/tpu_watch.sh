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
  if timeout 150 python -c "
import jax.numpy as jnp
x = jnp.ones((1024, 1024)); print('alive', float((x @ x).sum()))" \
      >> "$LOG" 2>&1; then
    echo "TPU ALIVE $(date -u +%H:%M:%S) — launching runbook" >> "$LOG"
    bash tools/hw_measure.sh /tmp/hw_measure >> "$LOG" 2>&1
    echo "runbook done rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
    rm -f "$PIDF"
    exit 0
  fi
  echo "still wedged $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 600
done
echo "tpu_watch deadline reached, giving up" >> "$LOG"
rm -f "$PIDF"
exit 1
