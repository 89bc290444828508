#!/bin/bash
# Keep the at-spec quality run (scripts/quality_run.py) training for as
# long as this TPU session lives, without ever killing a client (a killed
# axon client wedges the terminal for everyone — see
# outputs/quality/README.md).  Loop:
#   - if the target step count is already checkpointed, exit;
#   - if a quality_run is still alive (pidfile OR pgrep — ADVICE r3: the
#     watch script launches without a pidfile), wait;
#   - else relaunch WITHOUT --fresh so the run resumes from
#     outputs/quality/ckpt.  quality_run itself holds the chip flock
#     (utils/tpu_lock.py), so a stray second client exits cleanly.
# Each launch gets a bounded --max-minutes so it periodically reaches the
# cooperative save/report path even if this supervisor dies first.
# Rapid-failure backoff (ADVICE r3): 4 consecutive launches that die in
# under 5 min abort the supervisor instead of relaunching forever.
# Env knobs: QSTEPS (default 4000), QMAXMIN per launch (default 25),
# QLOG (default outputs/quality_run_r04.log, appended), QARGS (extra
# quality_run.py flags), QDEADLINE (unix epoch; stop relaunching past it
# so the chip is guaranteed free for the round-end bench).
cd /root/repo || exit 1
QSTEPS="${QSTEPS:-4000}"
QMAXMIN="${QMAXMIN:-25}"
QLOG="${QLOG:-outputs/quality_run_r04.log}"
QDEADLINE="${QDEADLINE:-0}"
PIDFILE=outputs/quality_run.pid
FAILS=0
LAST_LAUNCH=0

ckpt_step() {
  # numeric suffixes only: orbax tmp dirs (step_N.orbax-checkpoint-tmp-*)
  # broke the integer compare in round 3 (supervisor_r03.log)
  ls outputs/quality/ckpt 2>/dev/null \
    | sed -n 's/^step_\([0-9][0-9]*\)$/\1/p' | sort -n | tail -1
}

alive() {
  { [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; } \
    || pgrep -f scripts/quality_run.py >/dev/null 2>&1
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
  if [ "$QDEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$QDEADLINE" ]; then
    echo "$(date -u +%H:%M:%S) QDEADLINE reached — supervisor exiting"
    exit 0
  fi
  if alive; then
    # Heartbeat alarm (VERDICT r4 Weak #3): quality_run prints at least
    # every 200 steps and is bounded by --max-minutes, so a log silent
    # for QMAXMIN+15 min means a wedged client.  We can NOT kill it (a
    # killed axon client wedges the terminal for everyone — see
    # outputs/quality/README.md); alarm loudly so a human/agent acts.
    if [ -f "$QLOG" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$QLOG") ))
      if [ "$age" -gt $(( (${QMAXMIN%.*} + 15) * 60 )) ]; then
        echo "$(date -u +%H:%M:%S) ALARM: quality_run alive but $QLOG" \
             "silent for ${age}s — likely wedged chip/client"
      fi
    fi
    sleep 60
    continue
  fi
  now="$(date +%s)"
  if [ "$((now - LAST_LAUNCH))" -lt 300 ]; then
    FAILS=$((FAILS + 1))
    if [ "$FAILS" -ge 4 ]; then
      echo "$(date -u +%H:%M:%S) $FAILS consecutive short-lived launches" \
           "— giving up (see $QLOG)"
      exit 1
    fi
  else
    FAILS=0
  fi
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU responsive — (re)launching quality run" \
         "(ckpt step ${step:-none})"
    LAST_LAUNCH="$(date +%s)"
    # shellcheck disable=SC2086
    nohup python scripts/quality_run.py --steps "$QSTEPS" \
      --max-minutes "$QMAXMIN" $QARGS \
      >> "$QLOG" 2>&1 &
    echo $! > "$PIDFILE"
    sleep 120
  else
    echo "$(date -u +%H:%M:%S) TPU wedged/busy — waiting"
    sleep 60
  fi
done
