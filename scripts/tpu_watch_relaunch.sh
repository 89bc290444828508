#!/bin/bash
# Probe the axon TPU until it answers, then launch (or resume) the
# at-spec quality run. Recovers from a wedged terminal (a killed client
# leaves a stale session lock that expires after a few minutes) without
# busy-holding a session.  Writes the SAME pidfile as the supervisor
# (ADVICE r3: both launch paths must be visible to the liveness check).
# Env knobs:
#   QSTEPS   total steps (default 4000; the run resumes across sessions)
#   QMAXMIN  cooperative wall-clock stop in minutes (default 0 = none)
#   QLOG     log file (default outputs/quality_run_r04.log, appended)
#   QARGS    extra quality_run.py flags
cd /root/repo || exit 1
QLOG="${QLOG:-outputs/quality_run_r04.log}"
PIDFILE=outputs/quality_run.pid
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU responsive — launching quality run"
    rm -f outputs/quality.stop
    # shellcheck disable=SC2086
    nohup python scripts/quality_run.py --steps "${QSTEPS:-4000}" \
      --max-minutes "${QMAXMIN:-0}" $QARGS \
      >> "$QLOG" 2>&1 &
    echo $! > "$PIDFILE"
    echo "quality pid $(cat "$PIDFILE")"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) TPU still wedged"
  sleep 60
done
