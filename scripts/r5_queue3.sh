#!/bin/bash
# Follow-up queue: waits for the ReLIC temperature run (pid in
# /tmp/r5_relic.pid) to finish, then runs the synth100 DeepCluster k=100
# twin of the shapes100 k=100 diagnostic — tests whether the 10-cluster
# quantization ceiling also explains the 0.109 synth100 plateau.
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r5_relic.pid)" 2>/dev/null; do sleep 60; done
sleep 90
python scripts/quality_run.py --algos deep_cluster --epochs 150 --eval-every 25 \
  --dataset synth100 --set num_classes=100 \
  --tag synth100-deepcluster-k100 > /tmp/r5_dc_k100_synth.log 2>&1
echo "[queue3] $(date +%H:%M:%S) done rc=$?" >> /tmp/r5_queue.log
