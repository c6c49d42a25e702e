#!/bin/bash
# Full-suite runner: one pytest process PER FILE.
#
# Why: a single long-lived pytest process accumulates XLA CPU compiler
# state and eventually SEGFAULTS inside backend_compile_and_load
# (observed twice on 8/19 at ~77%, REPRODUCED AND PINNED on 8/21 under
# faulthandler: the crash compiles a TRIVIAL elementwise program —
# train/spheres.py scaling_uniformity_loss, via
# tests/test_train.py::test_uniformity_ignores_dead_slots — after the
# suite's full compile prefix incl. the 8-device CPU-mesh sharding
# tests; runs/mono_suite_segfault.log has the stack). The same test
# passes standalone, and tools/repro_xla_cpu_segfault.py shows 400
# DISTINCT synthetic compiles with flat RSS do NOT reproduce — the
# corruption needs the suite's exact program sequence, i.e. an XLA CPU
# backend bug, not a leak in this repo. Per-file processes sidestep it
# and give the same coverage; the fast tier (pytest -m "not slow") is
# small enough to stay monolithic.
#
# Usage: bash tools/run_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
rc=0
for f in tests/test_*.py; do
  echo "===== $f"
  timeout 1200 python -m pytest "$f" -q -p no:cacheprovider "$@" || rc=1
done
echo "===== suite rc=$rc"
exit $rc
