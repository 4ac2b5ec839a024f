#!/bin/bash
# Serial TPU queue: smokes for the day's driver changes, then the
# graphlet target-4 benchmark, then bench.py.
cd /root/repo
set -x
mkdir -p results
timeout 1200 python -u run_ogb_mol.py --num_graphs 60 --epochs 1 --num_layer 2 --emb_dim 32 --batch_size 16 --graph_pooling sort > /tmp/q_ogb_sort.txt 2>&1
timeout 1200 python -u run_graphcount.py --model PPGN_eff --target 0 --h 2 --num_graphs 60 --batch_size 16 --epochs 2 --hidden 32 --layers 2 > /tmp/q_ppgn.txt 2>&1
timeout 1800 python -u run_zinc.py --model NGNN --num_graphs 60 --epochs 2 --hidden 16 --layers 2 --batch_size 8 --h 2 > /tmp/q_zinc_ngnn.txt 2>&1
timeout 1800 python -u run_zinc.py --model I2GNN --num_graphs 40 --epochs 2 --hidden 16 --layers 2 --batch_size 8 --h 2 > /tmp/q_zinc_i2.txt 2>&1
timeout 1200 python -u run_gps.py --cfg configs/gps/counting-GPS.yaml dataset.num_graphs 96 train.epochs 3 out_dir /tmp/gps_cnt 2>&1 | tail -20 > /tmp/q_gps_cnt.txt
timeout 1200 python -u bench.py > /tmp/q_bench.txt 2>&1
timeout 5400 python -u run_graphcount.py --dataset count_graphlet --target 4 --h 4 --batch_size 32 --lr 5e-3 --epochs 1200 --num_graphs 5000 --res_dir results/count_graphlet_t4 > results/count_graphlet_t4.out 2>&1
echo TPU_QUEUE_DONE > /tmp/tpu_queue.status
# quality reruns for the weaker counting targets (only reached if the
# outage leaves enough wall clock)
timeout 5400 python -u run_graphcount.py --target 2 --h 2 --batch_size 128 --lr 5e-3 --epochs 3000 --num_graphs 10000 --res_dir results/count_cycle_t2_long > results/count_cycle_t2_long.out 2>&1
timeout 5400 python -u run_graphcount.py --target 3 --h 3 --batch_size 128 --lr 1e-2 --epochs 3000 --num_graphs 10000 --res_dir results/count_cycle_t3_long > results/count_cycle_t3_long.out 2>&1
timeout 5400 python -u run_graphcount.py --dataset count_graphlet --target 3 --h 2 --batch_size 128 --lr 4e-3 --epochs 2000 --num_graphs 10000 --res_dir results/count_graphlet_t3_long > results/count_graphlet_t3_long.out 2>&1
echo TPU_QUEUE_ALL_DONE >> /tmp/tpu_queue.status
