#!/bin/bash
# Round-5 gate queue (session 1): per-family oracle noise floors + the
# relu-sae re-adjudication (VERDICT r4 next #1 and #3).
#
# Q1a re-runs the relu-sae gate WITH the family's own 3-seed batch-order
# noise floor (the round-4 run judged 1.135 against the TopK SAE's
# borrowed 4.5% band); Q1b gives the transcoder its own floor (its AMP
# 1.0485 exceeded the borrowed 1.0411); Q1c is a cheap mid-horizon
# scaling point for relu-sae (7k steps instead of 35k) — if the ratio is
# small there and grows with horizon, that is the chaos signature, not a
# training-contract bug (the 256-step probe already matched the oracle to
# 4e-6 relative).
#
# Timeouts per ADVICE r4: oracle epochs dominate (~8-20 min/epoch,
# 2x compile-server variance) -> 6h per ref-seeds job.
set -x
cd /root/repo
OUT=outputs/r5_measurements
echo '=== Q1a: relu-sae gate, 3 oracle seeds (750k tokens) ==='
timeout 21600 python tools/quality_gate.py --family relu-sae --ref-seeds 3 --modes f32,amp --out quality_gate_relu_sae.json > $OUT/gate_relu_sae_refseeds.log 2>&1
echo "gate_relu_sae_refseeds rc=$?"
echo '=== Q1b: transcoder gate, 3 oracle seeds (750k tokens) ==='
timeout 21600 python tools/quality_gate.py --family transcoder --ref-seeds 3 --modes f32,amp --out quality_gate_transcoder.json > $OUT/gate_transcoder_refseeds.log 2>&1
echo "gate_transcoder_refseeds rc=$?"
echo '=== Q1c: relu-sae mid-horizon point (150k tokens, same-order) ==='
timeout 10800 python tools/quality_gate.py --family relu-sae --tokens 150000 --modes f32 --out $OUT/gate_relu_sae_150k.json > $OUT/gate_relu_sae_150k.log 2>&1
echo "gate_relu_sae_150k rc=$?"
echo 'Q1 DONE'
