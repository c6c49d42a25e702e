#!/bin/bash
# Full-suite runner: one pytest process PER FILE.
#
# Why: a single long-lived pytest process accumulates XLA CPU compiler
# state and eventually SEGFAULTS inside backend_compile_and_load
# (observed twice on 8/19 at ~77% of the monolithic run, always in a
# late big-compile test that passes standalone; /tmp/full_suite.log has
# the faulthandler trace). Per-file processes sidestep it and give the
# same coverage; the fast tier (pytest -m "not slow") is small enough
# to stay monolithic.
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
