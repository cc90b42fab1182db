#!/bin/bash
# Round-5 chip queue (session 2): the EQUAL-PRECISION amp adjudication.
# The reference's production precision is CUDA AMP, so the fair amp-mode
# comparison is ours-amp vs an autocast-bf16 torch oracle (--oracle-amp)
# — if the reference's own bf16 training cost matches ours, the amp gate
# measures parity, not a defect.  150k tokens (~7k steps): the autocast
# oracle is ~0.5 s/step on this host (~60 min); 750k would take ~5 h.
# Runs after queue6; /tmp/queue4.pid is repointed here so queue5 (timing)
# waits for this too.
set -x
cd /root/repo
OUT=outputs/r5_measurements

if [ -f /tmp/queue6.pid ]; then
  while kill -0 "$(cat /tmp/queue6.pid)" 2>/dev/null; do sleep 60; done
fi

echo '=== Q7a: relu-sae 150k amp vs autocast-bf16 oracle ==='
timeout 14400 python tools/quality_gate.py --family relu-sae \
  --tokens 150000 --modes amp --oracle-amp \
  --out $OUT/gate_relu_sae_150k_amporacle.json \
  > $OUT/gate_relu_sae_150k_amporacle.log 2>&1
echo "gate_relu_sae_150k_amporacle rc=$?"
echo 'Q7 DONE'
