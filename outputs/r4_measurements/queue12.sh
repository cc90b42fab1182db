#!/bin/bash
# Session-4 controller: the two remaining full-scale on-chip family gates
# (queue11 lost both to the VM reboot; relu-sae had finished its f32 side).
set -x
cd /root/repo
OUT=outputs/r4_measurements
echo '=== Q12a: relu-sae gate, same-order (750k tokens) ==='
timeout 9000 python tools/quality_gate.py --family relu-sae --modes f32,amp --out quality_gate_relu_sae.json > $OUT/gate_relu_sae2.log 2>&1
echo "gate_relu_sae rc=$?"
echo '=== Q12b: relu-crosscoder gate, same-order (150k tokens x 4 layers) ==='
timeout 9000 python tools/quality_gate.py --family relu-crosscoder --tokens 150000 --modes f32,amp --out quality_gate_relu_crosscoder.json > $OUT/gate_relu_xc2.log 2>&1
echo "gate_relu_xc rc=$?"
echo 'Q12 DONE'
