#!/bin/bash
# Round-5 chip queue (session 2, post-reboot relaunch): the decisive
# relu-sae numerics legs + the transcoder noise floor.  The 22:09 VM
# reboot killed the original queue chain after Q1a (refseeds) finished.
#
# Adjudication state going in (see PARITY.md + queue3.sh header):
#   750k chip default:  f32 1.1351 / amp 1.1342  FAIL
#   relu oracle's own batch-order noise floor:    1.0058 (3 seeds)
#   150k CPU true-f32:  0.9997                    PASS
# => remaining hypothesis: MXU bf16-input matmuls (Precision.DEFAULT).
#
# Q4a: 750k chip f32+amp with matmul precision HIGHEST, oracle reused
#      from the Q1a record (cached oracle mse is rounded to 2 sig figs →
#      ratio granularity ±1%; decisive vs a 13.5% deviation).
# Q4b: 150k chip HIGHEST, oracle from the CPU run (3-sig-fig cache).
# Q4c: 150k chip DEFAULT, same cached oracle — the horizon-scaling
#      point: if default already deviates at 7k steps, compounding is
#      fast; if not, the 35k-step horizon is where chaos accumulates.
# Q4d: transcoder refseeds (VERDICT r4 #3: its AMP 1.0485 exceeded the
#      borrowed 1.0411 TopK floor) — CPU-heavy torch oracle, runs last
#      among the gates.
set -x
cd /root/repo
OUT=outputs/r5_measurements

echo '=== Q4a: relu-sae 750k f32+amp, chip, HIGHEST, cached oracle ==='
timeout 14400 python tools/quality_gate.py --family relu-sae \
  --tokens 750000 --modes f32,amp --matmul-precision highest \
  --oracle-from quality_gate_relu_sae.json \
  --out $OUT/gate_relu_sae_750k_highest.json \
  > $OUT/gate_relu_sae_750k_highest.log 2>&1
echo "gate_relu_sae_750k_highest rc=$?"

echo '=== Q4b: relu-sae 150k f32, chip, HIGHEST, cached oracle ==='
timeout 10800 python tools/quality_gate.py --family relu-sae \
  --tokens 150000 --modes f32 --matmul-precision highest \
  --oracle-from $OUT/gate_relu_sae_150k_cpu.json \
  --out $OUT/gate_relu_sae_150k_highest.json \
  > $OUT/gate_relu_sae_150k_highest.log 2>&1
echo "gate_relu_sae_150k_highest rc=$?"

echo '=== Q4c: relu-sae 150k f32, chip, DEFAULT, cached oracle ==='
timeout 10800 python tools/quality_gate.py --family relu-sae \
  --tokens 150000 --modes f32 \
  --oracle-from $OUT/gate_relu_sae_150k_cpu.json \
  --out $OUT/gate_relu_sae_150k_default.json \
  > $OUT/gate_relu_sae_150k_default.log 2>&1
echo "gate_relu_sae_150k_default rc=$?"

echo '=== Q4d: transcoder gate, 3 oracle seeds (750k tokens) ==='
timeout 21600 python tools/quality_gate.py --family transcoder \
  --ref-seeds 3 --modes f32,amp --out quality_gate_transcoder.json \
  > $OUT/gate_transcoder_refseeds.log 2>&1
echo "gate_transcoder_refseeds rc=$?"
echo 'Q4 DONE'
