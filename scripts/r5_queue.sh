#!/bin/bash
# Round-5 TPU job queue: waits for the running 1000-epoch DINO horizon run,
# then executes the remaining measurement jobs sequentially with the
# mandated ~90 s gap between TPU processes (CLAUDE.md TPU etiquette).
# Each job logs to /tmp/r5_<name>.log; never kills anything.
set -u
cd /root/repo

wait_pid() {
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
}

run() { # name, args...
  name=$1; shift
  echo "[queue] $(date +%H:%M:%S) starting $name" >> /tmp/r5_queue.log
  python scripts/quality_run.py "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "[queue] $(date +%H:%M:%S) finished $name (rc=$?)" >> /tmp/r5_queue.log
  sleep 90
}

echo "[queue] waiting on horizon run pid $(cat /tmp/dino1000.pid)" >> /tmp/r5_queue.log
wait_pid "$(cat /tmp/dino1000.pid)"
sleep 90

# 1. arch bisect: same corrected recipe + protocol as the ViT horizon run,
#    resnet18 backbone — isolates "DINO objective collapses" from
#    "ViT-384/6L cannot learn shapes100"
run dino_rn18 --algos dino --arch resnet18 --epochs 1000 --eval-every 100 \
  --dataset shapes100 --n-train 20480 --n-test 4096 \
  --set teacher_update=step --set center_init=zeros \
  --tag shapes100-dino-rn18-step-zeros-1000ep

# 2+3. fused-QKV decision (VERDICT r4 weak #2): r2 data-path protocol
run qkv_base --algos dino --epochs 3 --eval-every 3 --n-train 8192 \
  --n-test 1024 --no-write --tag qkv-base
run qkv_fused --algos dino --epochs 3 --eval-every 3 --n-train 8192 \
  --n-test 1024 --no-write --set encoder.fuse_qkv=true --tag qkv-fused

# 4. SimCLR temperature row (VERDICT r4 weak #3 / item 5)
run simclr_temp --algos simclr --epochs 150 --eval-every 25 \
  --dataset synth100 --set optimizer.lr=0.5 --set loss_fn.temperature=0.1 \
  --tag synth100-simclr-lr0.5-temp0.1

# 5. recipe bisect (VERDICT item 2): corrected recipe + paper's
#    first-epoch last-layer freeze, full 1000-epoch horizon
run dino_freeze --algos dino --epochs 1000 --eval-every 100 \
  --dataset shapes100 --n-train 20480 --n-test 4096 \
  --set teacher_update=step --set center_init=zeros \
  --set freeze_last_layer=1 \
  --tag shapes100-dino-step-zeros-freeze-1000ep

# 6. DeepCluster k=100 (dropped r3 item 6a): same protocol as the k=10 row
run dc_k100 --algos deep_cluster --epochs 300 --eval-every 50 \
  --dataset shapes100 --set num_classes=100 \
  --tag shapes100-deepcluster-k100

echo "[queue] $(date +%H:%M:%S) ALL DONE" >> /tmp/r5_queue.log
