#!/bin/bash
# Round-4 follow-up chip queue: runs AFTER tools/r4_measure.sh finishes.
# 1) stylize gate rerun with the crystal-patch construction (the r4s1
#    rod patch was mis-scaled vs the domain metric — NOTES_PERF r4s1),
# 2) forward-frame stage anatomy incl. tile-cull A/B (decides the next
#    kernel target),
# Usage: nohup bash tools/r4b_followup.sh > /tmp/r4b.log 2>&1 &
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

# Wait for the main queue to finish (never two TPU clients at once).
while ! grep -q "r4_measure.sh finished" /tmp/chip_watch.log 2>/dev/null; do
  sleep 120
done

# The chip can be mid-outage when the queue ends (it went down twice on
# 8/19); POLL for responsiveness rather than failing once.
until timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
print(jax.devices())
" 2>/dev/null; do
  echo "[r4b] chip unresponsive $(date -u +%H:%M:%S)" >&2
  sleep 120
done

# Stylize gate first: it does not touch the r4 kernel edits, so a
# Mosaic failure of those must not block it.
step stylegate_v2 4500 python tools/stylize_gate.py --content-n 200000 \
  --patch-m 2048 --fit-steps 1000 --out runs/stylegate

# Kernel edits since the queue's smoke (quad-form MXU power, pack_gather
# serving gather): re-gate Mosaic legality before kernel measurements.
step smoke 1200 python tools/tpu_smoke.py || exit 1

step fwd_anatomy 3600 python tools/perf_fwd_anatomy.py --iters 30 --cap-mult 4
# Fresh serving numbers (quad auto-applies under --fast, jitter off).
step perf_fast_v2 1500 python tools/perf_step.py \
  --modes segsum_sortpacked --iters 30 --fwd --cap-mult 4 --fast

echo "=== R4B ALL DONE $(date -u +%H:%M:%S) ===" >&2
cp -f /tmp/r4b.log runs/r4b_followup.log 2>/dev/null || true
