#!/bin/bash
# Detached heartbeat toucher for the long training run (runbook: crons
# don't fire while the interactive session is busy, so a detached process
# must keep $RUN/HEARTBEAT fresh for idle_guard.sh).
#
# Touches the heartbeat every 60 s UNTIL the hard deadline (epoch seconds,
# arg 1), then runs the full end-of-round protocol itself — pausing the
# run, preflighting the chip, and snapshotting resume state — so the
# driver's bench.py gets an idle chip even if the interactive session died
# hours earlier.  idle_guard.sh remains the second line of defence (it
# pauses on a stale heartbeat if this process is killed).
#
# Usage: setsid bash scripts/heartbeat_toucher.sh <deadline_epoch> &
set -u
RUN=/root/repo/runs/bg_full
DEADLINE=${1:?usage: heartbeat_toucher.sh <deadline_epoch>}
echo $$ > "$RUN/toucher.pid"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  # stop touching if the run was paused by hand (measurement window):
  # idle_guard already exited at STOP; keep sleeping until resume or deadline
  [ -f "$RUN/STOP" ] || touch "$RUN/HEARTBEAT"
  sleep 60
done
echo "[toucher] hard deadline reached; running end_of_round" >> "$RUN/run.log"
bash /root/repo/scripts/end_of_round.sh >> "$RUN/run.log" 2>&1
rm -f "$RUN/toucher.pid"
