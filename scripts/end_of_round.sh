#!/bin/bash
# End-of-round protocol (VERDICT round-2 weak #1: round 2 lost its official
# perf number because the driver's bench.py hit a recovering tunnel).
#
# 1. pause the training run (STOP stays in place so nothing relaunches),
# 2. PREFLIGHT the chip: block until a trivial op completes on the real
#    TPU backend, retrying through the minutes-long tunnel recovery window,
# 3. snapshot the run's resume artifacts into git (runs/ is not tracked
#    and the environment resets between rounds — this is what lets the
#    next round `learn --resume` instead of restarting from scratch).
#
# Run this 15-30 min before the round ends; the driver's bench.py then
# finds an idle, verified-healthy chip.
set -u
RUN=/root/repo/runs/bg_full
cd /root/repo

bash scripts/pause_run.sh
if [ -f "$RUN/watchdog.pid" ]; then
  OLD=$(cat "$RUN/watchdog.pid")
  while kill -0 "$OLD" 2>/dev/null; do sleep 5; done
fi
echo "[end_of_round] run paused; preflighting the chip"

PREFLIGHT_OK=0
for i in $(seq 1 20); do
  if PYTHONPATH=/root/repo:/root/.axon_site timeout 120 python - <<'EOF'
import jax, numpy as np
x = np.asarray(jax.jit(lambda a, b: a @ b)(
    jax.numpy.ones((256, 256)), jax.numpy.ones((256, 256))))
assert x[0, 0] == 256.0
print("preflight ok:", jax.devices())
EOF
  then
    PREFLIGHT_OK=1
    break
  fi
  echo "[end_of_round] preflight attempt $i failed; tunnel recovering, retrying in 30s"
  sleep 30
done

# snapshot only a RESTORABLE latest_state (round-4 lesson: committing a
# torn checkpoint is worse than none) — shared milestone-snapshot logic
bash /root/repo/scripts/snapshot_run.sh "Snapshot run state for cross-round resume (end of round)"
if [ "$PREFLIGHT_OK" -ne 1 ]; then
  echo "[end_of_round] FAILURE: chip preflight never succeeded after 20 attempts —"
  echo "[end_of_round] the tunnel is UNHEALTHY and the driver's bench.py will likely fail."
  echo "[end_of_round] Run state IS committed; keep probing the chip manually."
  exit 1
fi
echo "[end_of_round] done; chip idle, run state committed"
