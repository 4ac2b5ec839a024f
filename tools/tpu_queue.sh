#!/bin/bash
# Serial TPU queue, round 2: quality sweep for the weak counting targets
# (VERDICT "next round" item 3). Each run logs to results/<name>; numbers
# must be transcribed to BASELINE.md when a run finishes (results/ is
# wiped on machine restart).
cd /root/repo
set -x
mkdir -p results
# 5-cycles (t2): bigger receptive field + more data
timeout 5400 python -u run_graphcount.py --target 2 --h 3 --batch_size 128 --lr 5e-3 --epochs 2000 --num_graphs 10000 --res_dir results/ccyc_t2_h3 > results/ccyc_t2_h3.out 2>&1
timeout 7200 python -u run_graphcount.py --target 2 --h 2 --batch_size 128 --lr 5e-3 --epochs 2000 --num_graphs 20000 --res_dir results/ccyc_t2_n20k > results/ccyc_t2_n20k.out 2>&1
# 6-cycles (t3): more data
timeout 7200 python -u run_graphcount.py --target 3 --h 3 --batch_size 128 --lr 1e-2 --epochs 2000 --num_graphs 20000 --res_dir results/ccyc_t3_n20k > results/ccyc_t3_n20k.out 2>&1
# triangle-rectangle (t4): the generalization-limited one — more data
timeout 7200 python -u run_graphcount.py --dataset count_graphlet --target 4 --h 4 --batch_size 32 --lr 5e-3 --epochs 1200 --num_graphs 20000 --res_dir results/cgra_t4_n20k > results/cgra_t4_n20k.out 2>&1
echo TPU_QUEUE_DONE > /tmp/tpu_queue.status
# wider net on t2 if wall clock allows
timeout 5400 python -u run_graphcount.py --target 2 --h 2 --hidden 512 --batch_size 128 --lr 5e-3 --epochs 1500 --num_graphs 10000 --res_dir results/ccyc_t2_w512 > results/ccyc_t2_w512.out 2>&1
echo TPU_QUEUE_ALL_DONE >> /tmp/tpu_queue.status
