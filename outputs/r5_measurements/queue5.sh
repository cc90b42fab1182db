#!/bin/bash
# Round-5 chip queue (session 2, timing leg).  Waits for queue4 (the
# quality gates, whose torch oracles are CPU-heavy) so the wall-clock
# numbers don't share the host core (CLAUDE.md contention rule).
#
# Q5a: indexed-cliff probe, full matrix (VERDICT r4 #4 + #5): trainer
#      A/B on bf16 AND f32 epoch stacks, standalone fwd/fwdbwd
#      block_rows sweep for relu AND topk on both dtypes.
# Q5b: large-geometry trajectory gate (VERDICT r4 #6): 20-step torch-
#      oracle parity at D=1280/H=40960, both precision modes.
# Q5c: fresh clean-tree bench (headline + per-family), last.
set -x
cd /root/repo
OUT=outputs/r5_measurements

if [ -f /tmp/queue4.pid ]; then
  while kill -0 "$(cat /tmp/queue4.pid)" 2>/dev/null; do sleep 60; done
fi

echo '=== Q5a: indexed cliff probe, full matrix ==='
timeout 10800 python scripts/indexed_cliff_probe.py \
  --trainer-dtypes bf16,f32 --dtypes bf16,f32 \
  --out $OUT/cliff_probe.json > $OUT/cliff_probe_full.log 2>&1
echo "cliff_probe rc=$?"

echo '=== Q5b: large-geometry trajectory gate ==='
timeout 7200 python tools/large_traj_gate.py --out large_traj_gate.json \
  > $OUT/large_traj_gate.log 2>&1
echo "large_traj_gate rc=$?"

echo '=== Q5c: clean bench ==='
timeout 7200 python bench.py > $OUT/bench_r5.log 2>&1
echo "bench rc=$?"
echo 'Q5 DONE'
