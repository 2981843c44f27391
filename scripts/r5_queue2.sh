#!/bin/bash
# Follow-up queue: waits for r5_queue.sh to finish, then runs the ReLIC
# temperature row (reinforces the unified synth100 temperature finding with
# the second batch-negative algorithm that shipped with a soft temperature).
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r5_queue.pid)" 2>/dev/null; do sleep 60; done
sleep 90
python scripts/quality_run.py --algos relic --epochs 150 --eval-every 25 \
  --dataset synth100 --set loss_fn.temperature=0.1 \
  --tag synth100-relic-temp0.1 > /tmp/r5_relic_temp.log 2>&1
echo "[queue2] $(date +%H:%M:%S) done rc=$?" >> /tmp/r5_queue.log
