#!/bin/bash
# Round-5 tail job (cut-safe): transcoder 750k f32 at matmul precision
# HIGHEST against the cached CPU-refseeds oracle — the confirmatory
# mirror of the relu-sae adjudication (same mechanism, smaller effect:
# chip default f32 landed 1.015 vs the family's own 0.5% floor).
# Caveat recorded in PARITY.md: the cached oracle trained on
# CPU-extracted data, this run re-extracts on chip (bounded ~<=1%).
set -x
cd /root/repo
OUT=outputs/r5_measurements

if [ -f /tmp/queue9.pid ]; then
  while kill -0 "$(cat /tmp/queue9.pid)" 2>/dev/null; do sleep 60; done
fi

echo '=== Q11a: transcoder 750k f32, chip, HIGHEST, cached CPU oracle ==='
timeout 7200 python tools/quality_gate.py --family transcoder \
  --tokens 750000 --modes f32 --matmul-precision highest \
  --oracle-from $OUT/gate_transcoder_refseeds_cpu.json \
  --out $OUT/gate_transcoder_750k_highest.json \
  > $OUT/gate_transcoder_750k_highest.log 2>&1
echo "gate_transcoder_750k_highest rc=$?"
echo 'Q11 DONE'
