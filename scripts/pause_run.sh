#!/bin/bash
# Cleanly pause the long training run for a measurement window (strength
# ladder / Elo tournament need the one TPU chip to themselves).
#
# Kills the EXACT recorded PIDs (never by pattern) after raising the STOP
# flag so the watchdog does not relaunch.  Best moment to run: right after
# a `gate` line appears in run.log — the resume cursor is committed at
# model_saved, so pausing then loses nothing; pausing mid-iteration loses
# only that iteration's partial self-play.  Resume with resume_run.sh.
set -u
RUN=/root/repo/runs/bg_full
touch "$RUN/STOP"
if [ -f "$RUN/learn.pid" ]; then
  PID=$(cat "$RUN/learn.pid")
  if kill -0 "$PID" 2>/dev/null; then
    kill "$PID"
    for _ in $(seq 1 30); do
      kill -0 "$PID" 2>/dev/null || break
      sleep 1
    done
    kill -0 "$PID" 2>/dev/null && kill -9 "$PID"
  fi
fi
# the watchdog exits on its own at the STOP check after `wait` returns
echo "[pause] training paused; resume with scripts/resume_run.sh"
