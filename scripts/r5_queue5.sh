#!/bin/bash
# Follow-up queue: waits for queue4 (synth100 negative-free 1000-epoch tier)
# to finish, then runs the DATA axis of the DINO fixed-point conclusion.
# The shapes100 bisect program established "objective x data x tower" — but
# the data term rests only on the easy-set positive control; synth100 has
# just a 150-epoch compressed row (the protocol this repo invalidated for
# the negative-free family). Two runs complete the 2x2 matrix
# {shapes100, synth100} x {ViT, rn18} at the verbatim 1000-epoch horizon:
#   1. shipped faithful recipe on ViT-384/6L (reference parity; the config
#      that demonstrably learns the easy set) — does synth100 also pin at
#      the uniform point, probe-measured?
#   2. rn18 + corrected recipe — exact twin of shapes100-dino-rn18 (which
#      showed backbone 18x chance under a zero-MI teacher): does the conv
#      backbone's residual drive survive on textures?
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r5_queue4.pid)" 2>/dev/null; do sleep 60; done
sleep 90
python scripts/quality_run.py --algos dino --epochs 1000 --eval-every 100 \
  --dataset synth100 --n-train 20480 --n-test 4096 \
  --tag synth100-dino-1000ep > /tmp/r5_dino_synth_vit.log 2>&1
echo "[queue5] $(date +%H:%M:%S) dino_synth_vit done rc=$?" >> /tmp/r5_queue.log
sleep 90
python scripts/quality_run.py --algos dino --arch resnet18 --epochs 1000 \
  --eval-every 100 --dataset synth100 --n-train 20480 --n-test 4096 \
  --set teacher_update=step --set center_init=zeros \
  --tag synth100-dino-rn18-step-zeros-1000ep > /tmp/r5_dino_synth_rn18.log 2>&1
echo "[queue5] $(date +%H:%M:%S) dino_synth_rn18 done rc=$?" >> /tmp/r5_queue.log
echo "[queue5] $(date +%H:%M:%S) ALL DONE" >> /tmp/r5_queue.log
