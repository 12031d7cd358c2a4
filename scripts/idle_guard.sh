#!/bin/bash
# Detached dead-man switch for the long training run.
#
# The interactive session touches $RUN/HEARTBEAT while it is alive (each
# monitor poll).  If the heartbeat goes stale — the session ended, crashed,
# or the round is over — this guard pauses the run (STOP + exact-PID kill
# via pause_run.sh) so the driver's end-of-round bench.py always gets an
# idle chip, then exits.  One-shot: resume_run.sh + relaunching this guard
# re-arms it.
#
# Usage: setsid bash scripts/idle_guard.sh [stale_secs] & (default 300)
set -u
RUN=/root/repo/runs/bg_full
STALE=${1:-300}
HB="$RUN/HEARTBEAT"
touch "$HB"
echo $$ > "$RUN/idle_guard.pid"
while :; do
  sleep 30
  # already paused by hand? nothing to guard
  [ -f "$RUN/STOP" ] && break
  now=$(date +%s)
  hb=$(stat -c %Y "$HB" 2>/dev/null || echo 0)
  if [ $((now - hb)) -gt "$STALE" ]; then
    echo "[idle_guard] heartbeat stale $((now - hb))s; pausing run" >> "$RUN/run.log"
    bash /root/repo/scripts/pause_run.sh >> "$RUN/run.log" 2>&1
    break
  fi
done
rm -f "$RUN/idle_guard.pid"
