#!/bin/bash
# Final round-5 queue: waits for queue5 (synth100 DINO horizon pair), then
# completes the verbatim-1000-epoch synth100 tier for the remaining
# algorithms (shipped configs), giving the texture benchmark the same
# full-horizon status as shapes100:
#   * swav   — 0.073 at 150ep: does it phase-transition like the
#              negative-free family, or is the plateau real?
#   * moco   — 0.53 at 300ep and still rising: where is the ceiling?
#   * sela   — 0.14 at 150ep, rising slowly.
#   * relic  — shipped temp 1.0 (0.11 at 150ep): does the soft-temperature
#              plateau persist at the full horizon, or merely delay?
#   * simclr — shipped temp 0.5 (0.128 at 150ep): same question; a late
#              transition would soften "temperature was binding" to
#              "temperature delays".
#   * pirl   — 0.36 at 150ep, still rising (longest job, ~82 min).
# deep_cluster is excluded: per-epoch K-means makes 1000 epochs a ~7.7 h
# run (27.6 s/epoch measured); its 150/300-epoch rows carry the reading.
# Ordered cheapest-first so a relay loss late in the night costs the least.
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r5_queue5.pid)" 2>/dev/null; do sleep 60; done
sleep 90

run() { # name, args...
  name=$1; shift
  python scripts/quality_run.py "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "[queue6] $(date +%H:%M:%S) $name done rc=$?" >> /tmp/r5_queue.log
  sleep 90
}

run swav_1000 --algos swav --epochs 1000 --eval-every 100 \
  --dataset synth100 --tag synth100-swav-1000ep
run moco_1000 --algos moco --epochs 1000 --eval-every 100 \
  --dataset synth100 --tag synth100-moco-1000ep
run sela_1000 --algos sela --epochs 1000 --eval-every 100 \
  --dataset synth100 --tag synth100-sela-1000ep
run relic_1000 --algos relic --epochs 1000 --eval-every 100 \
  --dataset synth100 --tag synth100-relic-1000ep
run simclr_1000 --algos simclr --epochs 1000 --eval-every 100 \
  --dataset synth100 --tag synth100-simclr-1000ep
run pirl_1000 --algos pirl --epochs 1000 --eval-every 100 \
  --dataset synth100 --tag synth100-pirl-1000ep
echo "[queue6] $(date +%H:%M:%S) ALL DONE" >> /tmp/r5_queue.log
