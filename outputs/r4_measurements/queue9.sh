#!/bin/bash
# Round-4 gate queue (session 2): the three family gates the VM reboot killed.
set -x
cd /root/repo
OUT=outputs/r4_measurements
echo '=== Q9a: crosscoder gate, same-order (300k tokens x 4 layers) ==='
timeout 9000 python tools/quality_gate.py --family crosscoder --tokens 300000 --modes f32,amp --out quality_gate_crosscoder.json > $OUT/gate_crosscoder_sameorder.log 2>&1
echo "gate_crosscoder rc=$?"
echo '=== Q9b: relu-sae gate, same-order (750k tokens) ==='
timeout 9000 python tools/quality_gate.py --family relu-sae --modes f32,amp --out quality_gate_relu_sae.json > $OUT/gate_relu_sae.log 2>&1
echo "gate_relu_sae rc=$?"
echo '=== Q9c: relu-crosscoder gate, same-order (150k tokens x 4 layers) ==='
timeout 9000 python tools/quality_gate.py --family relu-crosscoder --tokens 150000 --modes f32,amp --out quality_gate_relu_crosscoder.json > $OUT/gate_relu_xc.log 2>&1
echo "gate_relu_xc rc=$?"
echo 'Q9 DONE'
