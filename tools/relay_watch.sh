#!/bin/bash
# Watch for the axon TPU relay (port 8082) to come back, then launch the
# round-3 measurement session exactly once. The relay's stdio belongs to
# the outside orchestrator — it cannot be restarted from inside the VM;
# all we can do is poll for its reappearance (see memory: env facts).
# Usage: nohup bash tools/relay_watch.sh > /tmp/relay_watch.log 2>&1 &
set -u
cd /root/repo

while true; do
  if ss -tln 2>/dev/null | grep -q ':8082 '; then
    echo "[watch] relay up $(date -u +%H:%M:%S); settling 15s"
    sleep 15
    # Confirm it stayed up (avoid racing a flapping relay).
    if ss -tln 2>/dev/null | grep -q ':8082 '; then
      echo "[watch] launching r3_measure.sh"
      bash tools/r3_measure.sh > /tmp/r3_measure.log 2>&1
      echo "[watch] r3_measure.sh finished rc=$? $(date -u +%H:%M:%S)"
      exit 0
    fi
  fi
  sleep 45
done
