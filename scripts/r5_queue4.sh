#!/bin/bash
# Follow-up queue: waits for queue3 (synth100 DeepCluster k=100) to finish,
# then runs the negative-free family + barlow at the verbatim 1000-epoch
# horizon on synth100 — closes the "short-schedule regime" caveat in the
# synth100 ranking (the shapes100 tier showed byol/simsiam phase-transition
# between epochs 100-200 under the full-length schedule; this asks whether
# the same happens on the texture benchmark).
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r5_queue3.pid)" 2>/dev/null; do sleep 60; done
sleep 90
python scripts/quality_run.py --algos byol,simsiam,barlow --epochs 1000 \
  --eval-every 100 --dataset synth100 \
  --tag synth100-negfree-1000ep > /tmp/r5_negfree.log 2>&1
echo "[queue4] $(date +%H:%M:%S) done rc=$?" >> /tmp/r5_queue.log
