#!/bin/bash
# Round-5 chip queue (session 2): runs AFTER queue1 (the refseeds gates)
# so its TIMING measurements don't share the host core with the torch
# oracles (CLAUDE.md contention rule).
#
# Q2a: indexed-cliff probe, full matrix (VERDICT r4 #4 + #5): trainer
#      A/B on bf16 AND f32 epoch stacks, standalone fwd/fwdbwd block_rows
#      sweep for relu AND topk on both dtypes.  The first run's trainer
#      section (clean host, bf16) already showed NO cliff — relu sliced
#      2.954 vs indexed 2.960 ms/step at batch 32768 — before dying on a
#      transient compile-server broken pipe mid-standalone.
# Q2b: large-geometry trajectory gate (VERDICT r4 #6): 20-step torch-
#      oracle parity at D=1280/H=40960 through the blocked encode kernel,
#      both precision modes -> large_traj_gate.json.
# Q2c: fresh clean-tree bench (headline + per-family) once everything
#      else is done.
set -x
cd /root/repo
OUT=outputs/r5_measurements

# wait for queue1 (pid file) to exit
if [ -f /tmp/queue1.pid ]; then
  while kill -0 "$(cat /tmp/queue1.pid)" 2>/dev/null; do sleep 60; done
fi

echo '=== Q2a: indexed cliff probe, full matrix ==='
timeout 10800 python scripts/indexed_cliff_probe.py \
  --trainer-dtypes bf16,f32 --dtypes bf16,f32 \
  --out $OUT/cliff_probe.json > $OUT/cliff_probe_full.log 2>&1
echo "cliff_probe rc=$?"

echo '=== Q2b: large-geometry trajectory gate ==='
timeout 7200 python tools/large_traj_gate.py --out large_traj_gate.json \
  > $OUT/large_traj_gate.log 2>&1
echo "large_traj_gate rc=$?"

echo '=== Q2c: clean bench ==='
timeout 7200 python bench.py > $OUT/bench_r5.log 2>&1
echo "bench rc=$?"
echo 'Q2 DONE'
