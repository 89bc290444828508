#!/bin/bash
# Round-5 perf window (VERDICT r4 next-step 4): per-stage profile, then a
# kernel-schedule sweep over the round-5 knobs.  Run AFTER the at-spec
# quality run releases the chip flock — every leg takes the flock itself
# (bench.py / profile_step.py), so legs serialize cleanly.
# Output: outputs/perf_r05/*.log, one JSON line per bench leg.
cd /root/repo || exit 1
mkdir -p outputs/perf_r05
run() {
  name="$1"; shift
  echo "=== $name: $*"
  timeout 900 python "$@" 2>&1 | tee "outputs/perf_r05/$name.log" | tail -2
}
run profile scripts/profile_step.py
run bench_default       bench.py
run bench_cumsum        bench.py --prefix cumsum
run bench_cumsum_c256   bench.py --prefix cumsum --chunk 256
run bench_c256          bench.py --chunk 256
run bench_tile16x32     bench.py --tile 16x32
run bench_cumsum_16x32  bench.py --prefix cumsum --tile 16x32
echo "=== done; logs under outputs/perf_r05/"
