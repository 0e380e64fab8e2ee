#!/bin/bash
# Babysits the round-5 validation run (same design as round 4's: the TPU
# tunnel worker occasionally restarts and leaves the client hung).  If the
# replica-0 bond.dat goes stale for >6 min, kill the EXACT validator pid
# and relaunch; --resume-state restarts at the last completed output.
PROGRESS=/root/repo/out/flagship_r05/bond.dat
LOG=/tmp/validation_r05.log
DONE_MARK=/root/repo/VALIDATION_r05.json
STOP_MARK=/tmp/val_r05_stop        # touch this to stop the watchdog cleanly

launch() {
  nohup /root/repo/scripts/run_validation_r05.sh >> "$LOG" 2>&1 &
  VPID=$!
  LAUNCH_T=$(date +%s)
  echo "$VPID" > /tmp/val_r05_vpid
  echo "$(date -u +%H:%M:%S) launched validator pid $VPID" >> /tmp/val_watchdog_r05.log
}

launch
while true; do
  sleep 60
  if [ -f "$STOP_MARK" ]; then
    echo "$(date -u +%H:%M:%S) stop mark seen; killing $VPID and exiting" >> /tmp/val_watchdog_r05.log
    kill "$VPID" 2>/dev/null
    sleep 5
    kill -9 "$VPID" 2>/dev/null
    exit 0
  fi
  if [ -f "$DONE_MARK" ] && ! kill -0 "$VPID" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) validation complete" >> /tmp/val_watchdog_r05.log
    exit 0
  fi
  if ! kill -0 "$VPID" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) validator died; relaunching" >> /tmp/val_watchdog_r05.log
    launch
    continue
  fi
  if [ -f "$PROGRESS" ]; then
    # staleness is measured from the LATER of the last output and this
    # validator's launch: after a pause (TPU window) the file is already
    # old at launch, and the first output costs a ~5-10 min recompile —
    # measuring from mtime alone kill-loops the resume forever (hit r5)
    mt=$(stat -c %Y "$PROGRESS")
    base=$(( mt > LAUNCH_T ? mt : LAUNCH_T ))
    age=$(( $(date +%s) - base ))
    if [ "$age" -gt 600 ]; then
      echo "$(date -u +%H:%M:%S) stale ${age}s; killing $VPID for resume" >> /tmp/val_watchdog_r05.log
      kill "$VPID" 2>/dev/null
      sleep 5
      kill -9 "$VPID" 2>/dev/null
      sleep 2
      launch
    fi
  fi
done
