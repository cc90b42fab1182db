#!/bin/bash
# Session-3 controller: wait for queue10 (kernel check + clean bench, pid $1),
# then run the two remaining on-chip family gates at full scale.
set -x
cd /root/repo
OUT=outputs/r4_measurements
Q10_PID=${1:?queue10 pid}
while kill -0 "$Q10_PID" 2>/dev/null; do sleep 30; done
echo '=== Q11a: relu-sae gate, same-order (750k tokens) ==='
timeout 9000 python tools/quality_gate.py --family relu-sae --modes f32,amp --out quality_gate_relu_sae.json > $OUT/gate_relu_sae.log 2>&1
echo "gate_relu_sae rc=$?"
echo '=== Q11b: relu-crosscoder gate, same-order (150k tokens x 4 layers) ==='
timeout 9000 python tools/quality_gate.py --family relu-crosscoder --tokens 150000 --modes f32,amp --out quality_gate_relu_crosscoder.json > $OUT/gate_relu_xc.log 2>&1
echo "gate_relu_xc rc=$?"
echo 'Q11 DONE'
