#!/bin/bash
# Round-5 at-spec launch (VERDICT r4 next-step 1): resume the r04
# checkpoint (step 972, coarse rung of 1200) and carry it to 4000 steps
# at 800^2 heavy blur under the supervisor.  The recipe is the r04
# camera-frame one plus the round-5 levers: pose-lr re-warm at promotion
# and momentum-free exposure Adam (exposure_b1=0, now the quality-run
# default).  Time-based evals + exit-path reports (round-5 hardening)
# make every session leave a scored QUALITY_r05.json.
cd /root/repo || exit 1
export QSTEPS="${QSTEPS:-4000}"
export QMAXMIN="${QMAXMIN:-30}"
export QLOG=outputs/quality_run_r05.log
# NOTE: flags must match the r04 fixture knobs persisted beside the
# checkpoint (outputs/quality/ckpt/fixture.json) on all SHARED keys.
export QARGS="--coarse-steps 1200 --coarse-downscale 2 --pose-warmup 100 \
 --pose-trans-lr-scale 1.0 --pose-b1 0.0 --densify-start 1600 \
 --pose-rewarm --eval-every-s 420 --out QUALITY_r05.json \
 --run-label r05-main ${QEXTRA:-}"
exec bash scripts/quality_supervisor.sh
