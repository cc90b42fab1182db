#!/bin/bash
# Session-2 controller: wait for the in-flight crosscoder gate (pid $1),
# then validate the final tree on-chip (commits 88d5569/1c576d9 landed
# after the last on-chip run) and take a clean bench.
set -x
cd /root/repo
OUT=outputs/r4_measurements
GATE_PID=${1:?gate pid}
while kill -0 "$GATE_PID" 2>/dev/null; do sleep 30; done
echo '=== Q10a: kernel checks on the final tree ==='
timeout 5400 python scripts/check_tpu_kernels.py > $OUT/check_kernels_final.log 2>&1
echo "check_kernels_final rc=$?"
echo '=== Q10b: clean bench (post-fix policy: coder families sliced) ==='
timeout 7200 python bench.py > $OUT/bench_final.log 2>&1
echo "bench_final rc=$?"
echo 'Q10 DONE'
