#!/bin/bash
# Round-5 chip queue (session 3): relu-sae numerics triangulation,
# on-chip leg.  Runs AFTER queue2 (timing jobs must not share the host
# core).  Together with Q1c (150k, chip, default precision) and Q3a
# (150k, cpu backend — launched separately, CPU-only), this separates
# "MXU bf16-input numerics" from "training-dynamics chaos" for the
# failing relu-sae family:
#
#   ratio(chip,default) > 1  &&  ratio(cpu) ~ 1  &&  ratio(chip,highest) ~ 1
#       -> MXU numerics (Precision.DEFAULT feeds bf16 to the MXU even in
#          f32 mode); fix = precision bump in the f32 relu path
#   ratio(cpu) ~ ratio(chip)  -> dynamics chaos; adjudicate vs the
#          family noise floor from Q1a
set -x
cd /root/repo
OUT=outputs/r5_measurements

if [ -f /tmp/queue2.pid ]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 60; done
fi

echo '=== Q3b: relu-sae 150k f32, chip, matmul precision HIGHEST ==='
timeout 10800 python tools/quality_gate.py --family relu-sae \
  --tokens 150000 --modes f32 --matmul-precision highest \
  --out $OUT/gate_relu_sae_150k_highest.json \
  > $OUT/gate_relu_sae_150k_highest.log 2>&1
echo "gate_relu_sae_150k_highest rc=$?"
echo 'Q3 DONE'
