#!/bin/bash
# Round-5 chip queue (session 2, continuation): queue4's Q4a crashed on
# a mid-run source-edit race (the gate process had imported the old
# TrainingConfig before the matmul_precision field landed, then the new
# trainer read it).  queue4's controller was killed after Q4b's python
# went in flight; this queue waits for that orphan, then runs the
# remaining legs in decisive-first order: Q4c (150k default A/B point),
# Q4a retry (the decisive 750k HIGHEST run), then Q4d (transcoder
# refseeds, CPU-heavy torch oracle last so it can't delay the verdict).
# /tmp/queue4.pid is rewritten to THIS script's pid so queue5 (timing
# leg) keeps waiting for the whole gate chain.
set -x
cd /root/repo
OUT=outputs/r5_measurements

# wait for the orphaned Q4b python (pid recorded by the launcher)
if [ -f /tmp/q4b.pid ]; then
  while kill -0 "$(cat /tmp/q4b.pid)" 2>/dev/null; do sleep 60; done
fi

echo '=== Q4c: relu-sae 150k f32, chip, DEFAULT, cached oracle ==='
timeout 10800 python tools/quality_gate.py --family relu-sae \
  --tokens 150000 --modes f32 \
  --oracle-from $OUT/gate_relu_sae_150k_cpu.json \
  --out $OUT/gate_relu_sae_150k_default.json \
  > $OUT/gate_relu_sae_150k_default.log 2>&1
echo "gate_relu_sae_150k_default rc=$?"

echo '=== Q4a retry: relu-sae 750k f32+amp, chip, HIGHEST, cached oracle ==='
timeout 14400 python tools/quality_gate.py --family relu-sae \
  --tokens 750000 --modes f32,amp --matmul-precision highest \
  --oracle-from quality_gate_relu_sae.json \
  --out $OUT/gate_relu_sae_750k_highest.json \
  > $OUT/gate_relu_sae_750k_highest.log 2>&1
echo "gate_relu_sae_750k_highest rc=$?"

echo '=== Q4d: transcoder gate, 3 oracle seeds (750k tokens) ==='
timeout 21600 python tools/quality_gate.py --family transcoder \
  --ref-seeds 3 --modes f32,amp --out quality_gate_transcoder.json \
  > $OUT/gate_transcoder_refseeds.log 2>&1
echo "gate_transcoder_refseeds rc=$?"
echo 'Q6 DONE'
