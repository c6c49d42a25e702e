#!/bin/bash
# Poll for the TPU to become RESPONSIVE (the relay port can be open while
# the backend hangs — jax.devices() then blocks forever, so the probe is
# an actual tiny computation under timeout), then launch the round-4
# measurement queue exactly once.
# Usage: nohup bash tools/chip_watch.sh > /tmp/chip_watch.log 2>&1 &
#        echo $! > /tmp/chip_watch.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

while true; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
print(jax.devices())
" 2>/dev/null; then
    echo "[watch] chip responsive $(date -u +%H:%M:%S); launching r4_measure.sh"
    bash tools/r4_measure.sh > /tmp/r4_measure.log 2>&1
    echo "[watch] r4_measure.sh finished rc=$? $(date -u +%H:%M:%S)"
    exit 0
  fi
  echo "[watch] chip unresponsive $(date -u +%H:%M:%S)"
  sleep 120
done
