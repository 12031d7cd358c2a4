#!/bin/bash
# Watchdog for the full-scale backgammon training run (VERDICT round-1
# item 1).  Relaunches `learn --resume` whenever the process exits —
# the axon TPU tunnel kills long executions and needs minutes to recover
# after a crash (CLAUDE.md), so back off before retrying.
#
# Usage:  setsid bash scripts/run_watchdog.sh &   (detached; survives the
# launching session).  PID file: runs/bg_full/watchdog.pid — stop with
# `kill $(cat runs/bg_full/watchdog.pid)` then kill the child learn PID
# in runs/bg_full/learn.pid.  Never kill by pattern.
set -u
RUN=/root/repo/runs/bg_full
echo $$ > "$RUN/watchdog.pid"
cd "$RUN"
while true; do
  if [ -f "$RUN/STOP" ]; then
    echo "[watchdog] STOP file present; exiting" >> "$RUN/run.log"
    break
  fi
  PYTHONPATH=/root/repo:/root/.axon_site \
    DIE_E_SP_COMPACT=1 DIE_E_ARENA_COMPACT=1 \
    python -m die_e_tpu.cli.main -c /root/repo/configs/bg_full.toml \
    -g backgammon --metrics-jsonl ./metrics.jsonl learn --resume \
    >> ./run.log 2>&1 &
  echo $! > "$RUN/learn.pid"
  wait $!
  rc=$?
  echo "[watchdog] learn exited rc=$rc at $(date -u +%H:%M:%S)" >> "$RUN/run.log"
  if [ $rc -eq 0 ]; then
    echo "[watchdog] run complete" >> "$RUN/run.log"
    break
  fi
  sleep 180  # tunnel recovery time after a crash
done
rm -f "$RUN/watchdog.pid" "$RUN/learn.pid"
