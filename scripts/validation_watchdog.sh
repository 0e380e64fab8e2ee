#!/bin/bash
# Babysits the round-4 validation run: the TPU tunnel worker occasionally
# restarts and leaves the client hung (observed r4, ~45 min in).  If the
# replica-0 bond.dat goes stale for >6 min, kill the EXACT validator pid
# and relaunch; --resume-state restarts at the last completed output.
PROGRESS=/root/repo/out/flagship_r04/bond.dat
LOG=/tmp/validation_r04.log
DONE_MARK=/root/repo/VALIDATION_r04.json

launch() {
  nohup /root/repo/scripts/run_validation_r04.sh >> "$LOG" 2>&1 &
  VPID=$!
  echo "$(date -u +%H:%M:%S) launched validator pid $VPID" >> /tmp/val_watchdog.log
}

launch
while true; do
  sleep 60
  if [ -f "$DONE_MARK" ] && ! kill -0 "$VPID" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) validation complete" >> /tmp/val_watchdog.log
    exit 0
  fi
  if ! kill -0 "$VPID" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) validator died; relaunching" >> /tmp/val_watchdog.log
    launch
    continue
  fi
  if [ -f "$PROGRESS" ]; then
    age=$(( $(date +%s) - $(stat -c %Y "$PROGRESS") ))
    if [ "$age" -gt 360 ]; then
      echo "$(date -u +%H:%M:%S) stale ${age}s; killing $VPID for resume" >> /tmp/val_watchdog.log
      kill "$VPID" 2>/dev/null
      sleep 5
      kill -9 "$VPID" 2>/dev/null
      sleep 2
      launch
    fi
  fi
done
