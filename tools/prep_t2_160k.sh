#!/bin/bash
# CPU-side featurization prep for the t2@160k run: build the
# data/count_cycle/*n160000* cache with JAX forced to CPU so the chip
# stays free for queue 19's earlier jobs. --epochs 0 featurizes, builds
# pools, and exits without training.
cd /root/repo
JAX_PLATFORMS=cpu timeout 5400 python -u run_graphcount.py \
  --target 2 --h 2 --batch_size 128 --num_graphs 160000 \
  --compress_pools --num_workers 2 --epochs 0 \
  --res_dir results/prep160k > results/prep160k.out 2>&1
touch /tmp/prep160k.done
