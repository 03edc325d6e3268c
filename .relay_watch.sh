#!/bin/bash
# Poll the axon relay; exit 0 the moment jax.devices() succeeds.
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; d=jax.devices(); assert d" 2>/dev/null; then
    echo "RELAY UP at $(date -u +%H:%M:%S) after $i polls"
    exit 0
  fi
  sleep 180
done
echo "RELAY STILL DOWN after 200 polls"
exit 1
