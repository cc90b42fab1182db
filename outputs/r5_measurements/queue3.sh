#!/bin/bash
# Round-5 chip queue (session 3): relu-sae numerics triangulation,
# on-chip legs.  Runs AFTER queue2 (timing jobs must not share the host
# core).  Adjudication state when this was written:
#
#   750k chip default:  f32 1.1351 / amp 1.1342  FAIL   (Q1a re-run)
#   relu oracle's own batch-order noise floor:    1.0058 (3 seeds, Q1a)
#   150k CPU true-f32:  0.9997                    PASS   (Q3a)
#
# => NOT batch-order chaos (floor 0.6%), NOT a contract bug (CPU true-f32
#    matches to 3e-4).  Remaining hypothesis: MXU bf16-input matmuls
#    (Precision.DEFAULT feeds bf16 to the MXU even for f32 dots, so the
#    deviation is precision-MODE-consistent but still hardware numerics).
#
# Q3b: 150k chip, f32, matmul precision HIGHEST (multi-pass true f32 on
#      the MXU) — should land ~1.00 if the hypothesis holds.
# Q4a: 750k chip, f32+amp, HIGHEST, oracle reused from the Q1a record —
#      the decisive run at the failing gate's own scale.  f32 ~1.00
#      confirms root cause; the amp ratio measures the irreducible bf16
#      training cost for this family (bf16 inputs are amp by definition).
set -x
cd /root/repo
OUT=outputs/r5_measurements

if [ -f /tmp/queue2.pid ]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 60; done
fi

echo '=== Q3b: relu-sae 150k f32, chip, matmul precision HIGHEST ==='
ORACLE_150K=""
if [ -f "$OUT/gate_relu_sae_150k.json" ]; then
  ORACLE_150K="--oracle-from $OUT/gate_relu_sae_150k.json"
fi
timeout 10800 python tools/quality_gate.py --family relu-sae \
  --tokens 150000 --modes f32 --matmul-precision highest $ORACLE_150K \
  --out $OUT/gate_relu_sae_150k_highest.json \
  > $OUT/gate_relu_sae_150k_highest.log 2>&1
echo "gate_relu_sae_150k_highest rc=$?"

echo '=== Q4a: relu-sae 750k f32+amp, chip, HIGHEST, cached oracle ==='
timeout 14400 python tools/quality_gate.py --family relu-sae \
  --tokens 750000 --modes f32,amp --matmul-precision highest \
  --oracle-from quality_gate_relu_sae.json \
  --out $OUT/gate_relu_sae_750k_highest.json \
  > $OUT/gate_relu_sae_750k_highest.log 2>&1
echo "gate_relu_sae_750k_highest rc=$?"
echo 'Q3 DONE'
