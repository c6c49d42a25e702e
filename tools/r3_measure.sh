#!/bin/bash
# Round-3 TPU measurement session: run everything that needs the chip,
# sequentially (the axon tunnel serializes; two TPU clients poison each
# other's timings). Each step is timeout-bounded and failure-tolerant.
# Usage:  nohup bash tools/r3_measure.sh > /tmp/r3_measure.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@"
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# 0. Tunnel sanity probe (fail fast if the relay is still down).
step probe 120 python -c "import jax; print(jax.devices())" || exit 1

# 0b. Compile/run smoke: Mosaic kernel compilation only happens against
#     the real backend, so CPU-session work can land chip-only compile
#     regressions (r3: scf.yield layout mismatch). Gate the whole queue
#     on it.
step smoke 900 python tools/tpu_smoke.py || exit 1

# 1. Headline bench, full ladder -> committed by driver as BENCH_r03.
#    Also recorded in-repo (runs/) so the round keeps a perf artifact
#    even if the driver's own bench hits a tunnel outage.
step bench 3000 python bench.py | tee runs/bench_r3_interim.json

# 4. At-scale exact gate: 30k iters, 800^2, 300k-point detail scene
#    (dataset already rendered under runs/qgate_r3_800_300k/data).
step qgate_800 9000 python tools/quality_gate.py --iters 30000 --res 800 \
  --blobs 1200 --pts 250 --views 60 --detail --init-gt \
  --data runs/qgate_r3_800_300k/data --out runs/qgate_r3_800_300k

# 2. Step anatomy: default vs ablated reduction, fwd-only, fast chain.
step perf_exact 1200 python tools/perf_step.py \
  --modes segsum_sortpacked,none --iters 30 --fwd --cap-mult 5
step perf_fast 1200 python tools/perf_step.py \
  --modes segsum_sortpacked --iters 30 --fwd --cap-mult 5 --fast
# 2a2. Tile-cull A/B (exact per-tile ellipse cull; ~13% of dups culled
#      on the bench scene -> expect ~2-4 ms off the step).
step perf_nocull 1200 python tools/perf_step.py \
  --modes segsum_sortpacked --iters 30 --fwd --cap-mult 5 --no-tile-cull

# 2b. G=256 under the bf16 fast chain (NOTES r3s3 untried idea; lowering
#     validated by test_blend_g256_fast_tier_lowers_for_tpu).
step perf_fast_g256 1200 env WAST3D_BLEND_G=256 python tools/perf_step.py \
  --modes segsum_sortpacked --iters 30 --fwd --cap-mult 5 --fast

# 2c. 1M-scene step anatomy (where does the 723ms go at 1M/1296x832?).
#     --pieces isolates Adam/stats/m2d-tap; none-mode ablates the
#     gradient reduction; --fwd gives the fwd-only floor.
step perf_1m 3600 python tools/perf_step.py \
  --modes segsum_sortpacked,none --iters 10 --fwd --pieces --cap-mult 5 \
  --n 1000000 --res 1296x832

# 3. fast_chain quality gate (vs r2's 40.46 dB @ 7k/400^2 exact run).
step qgate_fast 3000 python tools/quality_gate.py --iters 7000 \
  --fast-chain --out runs/qgate_r3_fast

# 4b. 16k descriptor build (VERDICT item 4: target < 15 s/patch).
step descbuild 1200 python tools/perf_descbuild.py | tee runs/descbuild_r3.json

# 4c. Quantitative stylization gate (reference protocol: 1000 Adam
#     steps/ball) — desc-loss reduction + absolute edge-length W1.
step stylegate 3000 python tools/stylize_gate.py --content-n 200000 \
  --patch-m 2048 --fit-steps 1000 --out runs/stylegate_r3

# 5. 1M-Gaussian recon gate, truncated to 7k iters (config-3 class).
step qgate_1m 12000 python tools/quality_gate.py --iters 7000 --res 1024 \
  --blobs 4000 --pts 250 --views 60 --detail --init-gt \
  --out runs/qgate_r3_1m

echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
# Persist the session log next to its artifacts (tmp does not survive).
cp -f /tmp/r3_measure.log runs/r3_measure.log 2>/dev/null || true
