#!/bin/bash
# Keep the at-spec quality run (scripts/quality_run.py) training for as
# long as this TPU session lives, without ever killing a client (a killed
# axon client wedges the terminal for everyone — see
# outputs/quality/README.md).  Loop:
#   - if the target step count is already checkpointed, exit;
#   - if a quality_run we launched is still alive, wait;
#   - else probe the TPU (a stale session lock from a previous abrupt
#     session end clears on its own after a few minutes) and relaunch
#     WITHOUT --fresh, so the run resumes from outputs/quality/ckpt.
# Each launch gets a bounded --max-minutes so it periodically reaches the
# cooperative save/report path even if this supervisor dies first.
# Env knobs: QSTEPS (default 4000), QMAXMIN per launch (default 25),
# QLOG (default outputs/quality_run_r03.log, appended).
cd /root/repo || exit 1
QSTEPS="${QSTEPS:-4000}"
QMAXMIN="${QMAXMIN:-25}"
QLOG="${QLOG:-outputs/quality_run_r03.log}"
PIDFILE=outputs/quality_run.pid

ckpt_step() {
  ls outputs/quality/ckpt 2>/dev/null | sed -n 's/^step_//p' | sort -n | tail -1
}

while true; do
  step="$(ckpt_step)"
  if [ -n "$step" ] && [ "$step" -ge "$QSTEPS" ]; then
    echo "$(date -u +%H:%M:%S) checkpoint at step $step >= $QSTEPS — done"
    exit 0
  fi
  if [ -e outputs/quality.stop ]; then
    echo "$(date -u +%H:%M:%S) stop file present — supervisor exiting"
    exit 0
  fi
  if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    sleep 60
    continue
  fi
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU responsive — (re)launching quality run" \
         "(ckpt step ${step:-none})"
    nohup python scripts/quality_run.py --steps "$QSTEPS" \
      --max-minutes "$QMAXMIN" --run-label r03-heavyblur-joint \
      >> "$QLOG" 2>&1 &
    echo $! > "$PIDFILE"
    sleep 120
  else
    echo "$(date -u +%H:%M:%S) TPU wedged/busy — waiting"
    sleep 60
  fi
done
