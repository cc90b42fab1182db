#!/bin/bash
# Round-5 chip chain (restructured ~01:10 after discovering queue4.sh had
# survived its wrapper-kill and was racing queue6 through duplicate jobs,
# and that a CPU-heavy oracle inside a chip process holds the axon lock
# for hours).  New split: THIS chain owns the chip; queue10 owns the CPU
# (transcoder refseeds via --backend cpu, no axon).  Order:
#   Q9a  750k f32+amp HIGHEST, cached oracle -> the official relu-sae
#        record (also validates the kernel precision pin on real Mosaic)
#   Q9b  large-geometry trajectory gate (VERDICT r4 #6)
#   [wait for queue10 -- cliff timings need a quiet host core]
#   Q9c  indexed-cliff probe, full matrix (VERDICT r4 #4/#5)
#   Q9d  relu-sae 150k amp vs autocast-bf16 oracle (equal-precision amp
#        adjudication; CPU oracle ~60-90 min -- last, cut-safe)
set -x
cd /root/repo
OUT=outputs/r5_measurements

echo '=== Q9a: relu-sae 750k f32+amp, chip, HIGHEST, cached oracle ==='
timeout 10800 python tools/quality_gate.py --family relu-sae \
  --tokens 750000 --modes f32,amp --matmul-precision highest \
  --oracle-from quality_gate_relu_sae.json \
  --out $OUT/gate_relu_sae_750k_highest.json \
  > $OUT/gate_relu_sae_750k_highest_rerun.log 2>&1
echo "gate_relu_sae_750k_highest rc=$?"

echo '=== Q9b: large-geometry trajectory gate ==='
timeout 7200 python tools/large_traj_gate.py --out large_traj_gate.json \
  > $OUT/large_traj_gate.log 2>&1
echo "large_traj_gate rc=$?"

if [ -f /tmp/queue10.pid ]; then
  while kill -0 "$(cat /tmp/queue10.pid)" 2>/dev/null; do sleep 60; done
fi

echo '=== Q9c: indexed cliff probe, full matrix ==='
timeout 10800 python scripts/indexed_cliff_probe.py \
  --trainer-dtypes bf16,f32 --dtypes bf16,f32 \
  --out $OUT/cliff_probe.json > $OUT/cliff_probe_full.log 2>&1
echo "cliff_probe rc=$?"

echo '=== Q9d: relu-sae 150k amp vs autocast-bf16 oracle ==='
timeout 14400 python tools/quality_gate.py --family relu-sae \
  --tokens 150000 --modes amp --oracle-amp \
  --out $OUT/gate_relu_sae_150k_amporacle.json \
  > $OUT/gate_relu_sae_150k_amporacle.log 2>&1
echo "gate_relu_sae_150k_amporacle rc=$?"
echo 'Q9 DONE'
