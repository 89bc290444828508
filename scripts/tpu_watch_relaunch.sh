#!/bin/bash
# Probe the axon TPU until it answers, then launch the at-spec quality
# run (scripts/quality_run.py). Used to recover from a wedged terminal
# (memory: axon-kill-wedges-terminal) without busy-holding a session.
cd /root/repo || exit 1
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU responsive — launching quality run"
    rm -f outputs/quality.stop
    nohup python scripts/quality_run.py --steps "${QSTEPS:-4000}" \
      > outputs/quality_run6.log 2>&1 &
    echo "quality pid $!"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) TPU still wedged"
  sleep 120
done
