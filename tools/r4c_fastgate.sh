#!/bin/bash
# Contingency: the 12:10 chip outage stalled the fast-tier 30k gate at
# 25k iters (launched pre-resume-support, so nothing to resume). After
# the r4b follow-up finishes, if the fast gate JSON is still missing,
# re-run it WITH checkpoints/resume, then re-run bench so BENCH numbers
# reflect the final kernels.
# Usage: nohup bash tools/r4c_fastgate.sh > /tmp/r4c.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ===" >&2
  timeout "$tmo" "$@"
  local rc=$?
  echo "=== [$name] exit=$rc $(date -u +%H:%M:%S) ===" >&2
  return $rc
}

while ! grep -q "R4B ALL DONE" /tmp/r4b.log 2>/dev/null; do
  sleep 120
done

until timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" 2>/dev/null; do
  echo "[r4c] chip unresponsive $(date -u +%H:%M:%S)" >&2
  sleep 120
done

if [ ! -f runs/qgate_r4_800_30k_fast/quality_gate.json ]; then
  step qgate_800_fast 11000 python tools/quality_gate.py --iters 30000 \
    --res 800 --blobs 1200 --pts 250 --views 60 --detail --init-gt \
    --fast-chain \
    --data runs/qgate_r3_800_300k/data --out runs/qgate_r4_800_30k_fast
fi

step bench_final 4000 python bench.py > runs/bench_r4_final.json
cat runs/bench_r4_final.json

echo "=== R4C ALL DONE $(date -u +%H:%M:%S) ===" >&2
cp -f /tmp/r4c.log runs/r4c.log 2>/dev/null || true
