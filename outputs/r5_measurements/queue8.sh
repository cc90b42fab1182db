#!/bin/bash
# Round-5 chip queue (session 2): re-run of the decisive 750k HIGHEST
# gate.  The first attempt logged the f32 verdict (ratio 0.9869 PASS —
# gate_relu_sae_750k_highest.log:18) but crashed in amp mode before
# writing JSON: global highest attached an fp32 contract precision to
# the AMP kernel's bf16 matmuls, which Mosaic rejects ("Bad lhs type").
# The kernels now pin precision=_MXU on every dot, so this rerun both
# records the official JSON and validates the kernel fix on real Mosaic
# under a global highest override.  Runs after queue7; /tmp/queue4.pid
# is repointed here so queue5 (timing) stays last.
set -x
cd /root/repo
OUT=outputs/r5_measurements

if [ -f /tmp/queue7.pid ]; then
  while kill -0 "$(cat /tmp/queue7.pid)" 2>/dev/null; do sleep 60; done
fi

echo '=== Q8a: relu-sae 750k f32+amp, chip, HIGHEST, cached oracle (rerun) ==='
timeout 14400 python tools/quality_gate.py --family relu-sae \
  --tokens 750000 --modes f32,amp --matmul-precision highest \
  --oracle-from quality_gate_relu_sae.json \
  --out $OUT/gate_relu_sae_750k_highest.json \
  > $OUT/gate_relu_sae_750k_highest_rerun.log 2>&1
echo "gate_relu_sae_750k_highest rc=$?"
echo 'Q8 DONE'
