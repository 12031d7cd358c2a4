#!/bin/bash
# Crash-guarded strength ladder: runs strength_ladder.py with a resume-state
# file under `timeout`, retrying after tunnel wedges (the round-3/round-5
# failure mode: a pure-MCTS match randomly wedges the axon tunnel worker and
# the host blocks forever in a fetch).  Each retry loses at most one block.
#
# Usage: bash scripts/ladder_guarded.sh <model-path> <rungs> <state-file> \
#            [attempt-timeout-secs] [extra strength_ladder.py flags...]
set -u
cd "$(dirname "$0")/.."
MODEL="$1"; RUNGS="$2"; STATE="$3"; ATTEMPT_T="${4:-2400}"; shift 4 || shift 3
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jax_cache

probe() {  # wait until a trivial op completes on the tunnel
  for i in $(seq 1 30); do
    timeout 120 python - <<'EOF' && return 0
import jax, jax.numpy as jnp, numpy as np, random
# distinct constant so the tunnel's (program, inputs) cache can't serve it
x = jnp.arange(float(random.randint(1, 10**6)))
np.asarray(x.sum())
EOF
    echo "[ladder_guarded] tunnel not ready (probe $i), waiting 60s" >&2
    sleep 60
  done
  return 1
}

for attempt in $(seq 1 40); do
  echo "[ladder_guarded] attempt $attempt" >&2
  timeout "$ATTEMPT_T" python scripts/strength_ladder.py \
    --model-path "$MODEL" --rungs "$RUNGS" --resume-state "$STATE" "$@"
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[ladder_guarded] done" >&2
    exit 0
  fi
  echo "[ladder_guarded] attempt $attempt rc=$rc; probing tunnel" >&2
  probe || { echo "[ladder_guarded] tunnel never recovered" >&2; exit 1; }
done
echo "[ladder_guarded] gave up after 40 attempts" >&2
exit 1
