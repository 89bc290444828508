#!/bin/bash
# Probe the axon TPU until it answers, then launch (or resume) the
# at-spec round-3 quality run. Recovers from a wedged terminal (a killed
# client leaves a stale session lock that expires after a few minutes)
# without busy-holding a session.  Env knobs:
#   QSTEPS       total steps (default 4000; the run resumes across sessions)
#   QMAXMIN      cooperative wall-clock stop in minutes (default 0 = none)
#   QLOG         log file (default outputs/quality_run_r03.log, appended)
cd /root/repo || exit 1
QLOG="${QLOG:-outputs/quality_run_r03.log}"
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU responsive — launching quality run"
    rm -f outputs/quality.stop
    nohup python scripts/quality_run.py --steps "${QSTEPS:-4000}" \
      --max-minutes "${QMAXMIN:-0}" --run-label r03-heavyblur-joint \
      >> "$QLOG" 2>&1 &
    echo "quality pid $!"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) TPU still wedged"
  sleep 60
done
