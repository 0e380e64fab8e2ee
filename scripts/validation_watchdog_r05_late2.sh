#!/bin/bash
# Babysits the round-5 oracle-anchored late continuation.  Progress is the
# state file's mtime (this run writes no replica-0 output set); staleness
# is measured from max(mtime, launch time) with a 600 s grace for the
# cold-resume recompile.
PROGRESS=/tmp/val_r05e_state.npz
LOG=/tmp/validation_r05_late2.log
DONE_MARK=/root/repo/VALIDATION_r05_late2.json
STOP_MARK=/tmp/val_r05e_stop
WLOG=/tmp/val_watchdog_r05e.log

launch() {
  nohup /root/repo/scripts/run_validation_r05_late2.sh >> "$LOG" 2>&1 &
  VPID=$!
  LAUNCH_T=$(date +%s)
  echo "$VPID" > /tmp/val_r05e_vpid
  echo "$(date -u +%H:%M:%S) launched validator pid $VPID" >> "$WLOG"
}

launch
while true; do
  sleep 60
  if [ -f "$STOP_MARK" ]; then
    echo "$(date -u +%H:%M:%S) stop mark seen; killing $VPID and exiting" >> "$WLOG"
    kill "$VPID" 2>/dev/null
    sleep 5
    kill -9 "$VPID" 2>/dev/null
    exit 0
  fi
  if [ -f "$DONE_MARK" ] && ! kill -0 "$VPID" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) validation complete" >> "$WLOG"
    exit 0
  fi
  if ! kill -0 "$VPID" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) validator died; relaunching" >> "$WLOG"
    launch
    continue
  fi
  if [ -f "$PROGRESS" ]; then
    mt=$(stat -c %Y "$PROGRESS")
    base=$(( mt > LAUNCH_T ? mt : LAUNCH_T ))
    age=$(( $(date +%s) - base ))
    if [ "$age" -gt 600 ]; then
      echo "$(date -u +%H:%M:%S) stale ${age}s; killing $VPID for resume" >> "$WLOG"
      kill "$VPID" 2>/dev/null
      sleep 5
      kill -9 "$VPID" 2>/dev/null
      sleep 2
      launch
    fi
  fi
done
