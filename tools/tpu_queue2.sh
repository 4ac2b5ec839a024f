#!/bin/bash
# Follow-up TPU queue: 80k-graph runs for the two remaining hard cycle
# targets (data-scaling trend at 5k/10k/20k: t2 normalized MAE
# 0.0195 -> 0.0170 -> 0.0140, ~0.85x per doubling -> ~1e-2 at 80k).
# Launched by a wrapper that waits for tpu_queue.sh to finish (never two
# TPU processes).
cd /root/repo
set -x
mkdir -p results
timeout 10000 python -u run_graphcount.py --target 2 --h 2 --batch_size 128 --lr 5e-3 --epochs 1500 --num_graphs 80000 --num_workers 2 --res_dir results/ccyc_t2_n80k > results/ccyc_t2_n80k.out 2>&1
timeout 10000 python -u run_graphcount.py --target 3 --h 3 --batch_size 128 --lr 1e-2 --epochs 1500 --num_graphs 80000 --num_workers 2 --res_dir results/ccyc_t3_n80k > results/ccyc_t3_n80k.out 2>&1
echo TPU_QUEUE2_DONE > /tmp/tpu_queue2.status
