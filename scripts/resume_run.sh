#!/bin/bash
# Resume the long training run after a measurement window (see
# pause_run.sh).  Waits for the old watchdog (possibly still in its 180 s
# crash-backoff sleep) to observe STOP and exit BEFORE clearing the flag —
# otherwise two watchdogs could each launch a learn process.  Then
# relaunches the detached watchdog, which restarts `learn --resume` from
# the committed cursor.
set -u
RUN=/root/repo/runs/bg_full
if [ -f "$RUN/watchdog.pid" ]; then
  OLD=$(cat "$RUN/watchdog.pid")
  while kill -0 "$OLD" 2>/dev/null; do
    sleep 5
  done
fi
rm -f "$RUN/STOP"
setsid bash /root/repo/scripts/run_watchdog.sh < /dev/null > /dev/null 2>&1 &
sleep 2
echo "[resume] watchdog $(cat "$RUN/watchdog.pid" 2>/dev/null) relaunched"
