#!/bin/bash
# Round-3 session-7 chip queue: runs AFTER the 800^2 7k gate frees the
# chip. Answers the headline-regression question (tile-cull A/B on the
# bench fwd path), then the short stylize-side measurements.
# Usage: nohup bash tools/r3c_measure.sh > /tmp/r3c.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

# Banners go to stderr (stdout stays clean for JSON redirects) and the
# command's status is captured BEFORE the trailing banner so `|| exit 1`
# guards actually fire (round-3 advisor findings).
step() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ===" >&2
  timeout "$tmo" "$@"
  local rc=$?
  echo "=== [$name] exit=$rc $(date -u +%H:%M:%S) ===" >&2
  return $rc
}

step probe 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. Tile-cull A/B at the bench config (fwd + full step). The interim
#    bench's fwd fell 27.0 -> 23.4 MPix/s with cull ON by default; this
#    isolates whether the cull's ~25-op emission math is the cause.
step perf_cull 1500 python tools/perf_step.py \
  --modes segsum_sortpacked --iters 30 --fwd --cap-mult 5
step perf_nocull 1500 python tools/perf_step.py \
  --modes segsum_sortpacked --iters 30 --fwd --cap-mult 5 --no-tile-cull

# 2. 16k descriptor build (VERDICT item 4 target: < 15 s/patch).
step descbuild 1500 python tools/perf_descbuild.py > runs/descbuild_r3.json
cat runs/descbuild_r3.json

# 3. Quantitative stylization gate (1000 Adam steps/ball protocol).
step stylegate 3000 python tools/stylize_gate.py --content-n 200000 \
  --patch-m 2048 --fit-steps 1000 --out runs/stylegate_r3

echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
cp -f /tmp/r3c.log runs/r3c_measure.log 2>/dev/null || true
