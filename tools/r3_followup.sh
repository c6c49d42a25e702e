#!/bin/bash
# Follow-up chip measurements after tools/r3_measure.sh finishes: the
# 200k step-tail breakdown (--pieces) that the main queue only runs at
# 1M, plus anything queued from reading the main session's results.
# Usage: nohup bash tools/r3_followup.sh > /tmp/r3_followup.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@"
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

step probe 120 python -c "import jax; print(jax.devices())" || exit 1

# Where does the 200k step's non-blend ~11 ms tail go? (--pieces ablates
# Adam/stats/means2d-tap individually.)
step perf_pieces_200k 1800 python tools/perf_step.py \
  --modes segsum_sortpacked --iters 30 --pieces --cap-mult 5

echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
cp -f /tmp/r3_followup.log runs/r3_followup.log 2>/dev/null || true
