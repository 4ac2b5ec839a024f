#!/bin/bash
# Round-2 session-2 TPU queue: finish VERDICT item 3 (hard counting targets).
# Data-scaling trend for t2 (normalized test MAE): 5k 0.0195 -> 10k 0.0170
# -> 20k 0.0140 (~0.85x per doubling) => ~1e-2 at 80k. t3's 20k run was
# tail-dominated (val/test max-count mismatch); 40k smooths the split tails.
# Budget: leaves the last ~1h of the round free for bench + archiving.
cd /root/repo
set -x
mkdir -p results
timeout 8400 python -u run_graphcount.py --target 2 --h 2 --batch_size 128 \
  --lr 5e-3 --epochs 1400 --num_graphs 80000 --num_workers 2 \
  --res_dir results/ccyc_t2_n80k > results/ccyc_t2_n80k.out 2>&1
echo T2_DONE >> /tmp/tpu_queue3.status
timeout 5700 python -u run_graphcount.py --target 3 --h 3 --batch_size 128 \
  --lr 1e-2 --epochs 1400 --num_graphs 40000 --num_workers 2 \
  --res_dir results/ccyc_t3_n40k > results/ccyc_t3_n40k.out 2>&1
echo T3_DONE >> /tmp/tpu_queue3.status
echo TPU_QUEUE3_ALL_DONE >> /tmp/tpu_queue3.status
