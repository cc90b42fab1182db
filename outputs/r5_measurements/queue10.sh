#!/bin/bash
# Round-5 CPU chain: the transcoder oracle noise floor (VERDICT r4 #3 —
# its amp 1.0485 exceeded the borrowed TopK 1.0411 floor).  Runs with
# --backend cpu and NO axon (PALLAS_AXON_POOL_IPS= in the launcher env)
# so it never touches the chip lock: the floor is a property of the
# torch oracle (CPU either way), and the r4 CHIP ratios in
# quality_gate_transcoder.json are then adjudicated against it in
# PARITY.md.  Output goes to r5_measurements, NOT over the r4 chip
# record.  f32 mode only — the CPU ours-side is a bonus contract check.
set -x
cd /root/repo
OUT=outputs/r5_measurements

echo '=== Q10a: transcoder refseeds floor (CPU, 750k tokens, 3 seeds) ==='
timeout 21600 python tools/quality_gate.py --family transcoder \
  --ref-seeds 3 --modes f32 --backend cpu \
  --out $OUT/gate_transcoder_refseeds_cpu.json \
  > $OUT/gate_transcoder_refseeds.log 2>&1
echo "gate_transcoder_refseeds rc=$?"
echo 'Q10 DONE'
