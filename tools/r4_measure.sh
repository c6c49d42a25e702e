#!/bin/bash
# Round-4 TPU measurement session. Runs everything the VERDICT r3 asks
# for that needs the chip, sequentially (the axon tunnel serializes; two
# TPU clients poison each other's timings). Short, high-information
# probes first (they steer this round's kernel work); the long 30k
# quality gates follow; bench last as the round's perf artifact.
# Usage:  nohup bash tools/r4_measure.sh > /tmp/r4_measure.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

# Banners to stderr (stdout stays clean for JSON redirects); command
# status captured BEFORE the trailing banner so `|| exit` guards fire.
step() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ===" >&2
  timeout "$tmo" "$@"
  local rc=$?
  echo "=== [$name] exit=$rc $(date -u +%H:%M:%S) ===" >&2
  return $rc
}

# 0. Tunnel sanity probe + Mosaic compile smoke (chip-only lowering).
step probe 240 python -c "import jax; x=jax.numpy.ones((128,128)); print(jax.devices(), float((x@x).sum()))" || exit 1
step smoke 1200 python tools/tpu_smoke.py || exit 1

# 1. VERDICT item 7: 200k step-tail ablation (--pieces isolates
#    Adam/stats/means2d-tap) — decides the grad-reduce attack.
step perf_pieces_200k 1800 python tools/perf_step.py \
  --modes segsum_sortpacked,none --iters 30 --fwd --pieces --cap-mult 4

# 2. VERDICT item 1a: explain mpix_fast_chain 30.63 vs 29.84 (predicted
#    ~1.4x of the VPU chain). Exact-vs-fast fwd A/B + G=256 fast tier.
step perf_fast 1500 python tools/perf_step.py \
  --modes segsum_sortpacked --iters 30 --fwd --cap-mult 4 --fast
step perf_fast_g256 1500 env WAST3D_BLEND_G=256 python tools/perf_step.py \
  --modes segsum_sortpacked --iters 30 --fwd --cap-mult 4 --fast

# 3. VERDICT item 2: quantitative stylization gate (reference protocol:
#    1000 Adam steps/ball) + the 1M-scene end-to-end timing artifact.
step stylegate 4500 python tools/stylize_gate.py --content-n 200000 \
  --patch-m 2048 --fit-steps 1000 --out runs/stylegate
step stylegate_1m 7200 python tools/stylize_gate.py --content-n 1000000 \
  --patch-m 2048 --fit-steps 1000 --out runs/stylegate_1m

# 4. VERDICT item 3: at-scale recon gates, 30k/800^2/300k, exact AND
#    fast tier (dataset already rendered under runs/qgate_r3_800_300k).
step qgate_800_exact 11000 python tools/quality_gate.py --iters 30000 \
  --res 800 --blobs 1200 --pts 250 --views 60 --detail --init-gt \
  --data runs/qgate_r3_800_300k/data --out runs/qgate_r4_800_30k
step qgate_800_fast 11000 python tools/quality_gate.py --iters 30000 \
  --res 800 --blobs 1200 --pts 250 --views 60 --detail --init-gt \
  --fast-chain \
  --data runs/qgate_r3_800_300k/data --out runs/qgate_r4_800_30k_fast

# 5. Full bench ladder (now incl. restored trained-scene serving keys).
step bench 4000 python bench.py > runs/bench_r4_interim.json
cat runs/bench_r4_interim.json

# 6. 16k descriptor build re-measure (device-side masks landed r3s2).
step descbuild 1500 python tools/perf_descbuild.py > runs/descbuild_r4.json

echo "=== ALL DONE $(date -u +%H:%M:%S) ===" >&2
cp -f /tmp/r4_measure.log runs/r4_measure.log 2>/dev/null || true
