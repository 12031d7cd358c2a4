#!/bin/bash
# Milestone snapshot of the training run's resume artifacts into git.
#
# runs/ is untracked and the environment resets between rounds; round 4's
# snapshot advanced the cursor WITHOUT tracking latest_state/model_i, so
# round 5 resumed from `best` and lost a 9-iteration candidate lineage
# (ADVICE round-4 high).  This script is the fix: call it at EVERY
# measurement pause / milestone, not just at round end.  Safe to run only
# while the run is PAUSED (or right after a `gate` line) — snapshotting a
# mid-write latest_state is what caused the round-4 torn checkpoint.
#
# 1. probe-restore latest_state on CPU (heal interrupted swaps first);
#    only a restorable state is committed — a torn one is untracked so
#    resume takes the model_i fallback instead of aborting,
# 2. git add -f the cursor, metrics, best, newest two model_{i} dirs,
#    ladder/elo results,
# 3. commit.
#
# Usage: bash scripts/snapshot_run.sh ["commit message"]
set -u
RUN=/root/repo/runs/bg_full
MSG=${1:-"Snapshot run state for cross-round resume (metrics, cursor, latest/best checkpoints)"}
cd /root/repo

if [ ! -f "$RUN/STOP" ] && [ -f "$RUN/learn.pid" ] \
   && kill -0 "$(cat "$RUN/learn.pid")" 2>/dev/null; then
  echo "[snapshot] WARNING: learn process is RUNNING — latest_state may be mid-write."
  echo "[snapshot] Pause first (scripts/pause_run.sh) or snapshot right after a gate line."
fi

if PYTHONPATH=/root/repo:/root/.axon_site timeout 300 python - <<'EOF'
import jax; jax.config.update("jax_platforms", "cpu")
import orbax.checkpoint as ocp
from die_e_tpu.train import checkpoint as ckpt
p = ckpt.resolve_state_dir("/root/repo/runs/bg_full/models/backgammon/latest_state")
assert p is not None, "no latest_state"
tree = ocp.Checkpointer(ocp.PyTreeCheckpointHandler()).restore(p.absolute())
n = len(jax.tree_util.tree_leaves(tree))
assert n > 10, f"only {n} leaves"
print(f"latest_state restorable: {n} leaves")
EOF
then
  git add -f "$RUN/models/backgammon/latest_state"
else
  echo "[snapshot] WARNING: latest_state not restorable — snapshotting model_i/best only"
  git rm -r -q --cached "$RUN/models/backgammon/latest_state" 2>/dev/null || true
fi
for m in $(ls -d "$RUN"/models/backgammon/model_* 2>/dev/null \
             | sed 's/.*model_//' | sort -n | tail -2); do
  git add -f "$RUN/models/backgammon/model_$m"
done
git add -f \
  "$RUN/metrics.jsonl" \
  "$RUN/models/backgammon/latest_meta.json" \
  "$RUN/models/backgammon/best" 2>/dev/null
git add -f "$RUN/ladder.jsonl" "$RUN/elo_matches.jsonl" 2>/dev/null || true
git commit -q -m "$MSG" && echo "[snapshot] committed: $MSG" \
  || echo "[snapshot] nothing to commit"
