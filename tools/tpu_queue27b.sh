#!/bin/bash
# Round-5 TPU queue #27b (chained on queue 26, replaces 27): the
# queue-26 t4 completion run hit the known device-dispatch wedge at
# epoch 234 (17-min stall at a 5.1 s/epoch cadence — the t2@160k
# failure signature, BASELINE.md) and was killed by exact PID; queue
# 26 proceeds to bench_r5. This queue then runs the fixed flagship
# bf16-moments A/B, the driver-level copy-layout A/B, and the t4
# retry with the remaining time.
cd /root/repo
echo $$ > /tmp/q27b.pid
mkdir -p results results_archive

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  sleep 90
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-22 02:50:00' +%s)}"
ST=/tmp/tpu_queue27b.status

archive() {
  local name="$1" rd="results/$1"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
  if [ -d "$rd" ]; then
    [ -f "$rd/log.txt" ] && gzip -c "$rd/log.txt" \
        > "results_archive/$name/log.txt.gz"
    for f in config.json cmd_input.txt; do
      [ -f "$rd/$f" ] && cp "$rd/$f" "results_archive/$name/"
    done
  fi
}

run_if() {
  local est="$1" name="$2"; shift 2
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt "$est" ]; then
    echo "SKIP $name (need ${est}s, have ${rem}s)" >> "$ST"
    return
  fi
  echo "START $name $(date -u +%H:%M:%S)" >> "$ST"
  timeout "$est" "$@" > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> "$ST"
  archive "$name"
  sleep 90
}

run_if 1500 flagship_bf16_ab2 python -u tools/flagship_bf16_ab.py
run_if 1500 zinc_i2_uniform python -u run_zinc.py --model I2GNN \
    --copy_layout uniform --num_graphs 1000 --epochs 25 \
    --res_dir results/zinc_i2_uniform
run_if 1500 zinc_i2_bucketed python -u run_zinc.py --model I2GNN \
    --copy_layout bucketed --num_graphs 1000 --epochs 25 \
    --res_dir results/zinc_i2_bucketed
run_if 9000 cgra_t4_ppgn_n10k_r2 python -u run_graphcount.py \
    --dataset count_graphlet --target 4 --h 4 --model PPGN_eff \
    --num_graphs 10000 --batch_size 128 --lr 5e-4 \
    --lr_decay_factor 0.8 --patience 30 --grad_clip 1.0 \
    --epochs 1400 --res_dir results/cgra_t4_ppgn_n10k_r2
echo TPU_QUEUE27B_ALL_DONE >> "$ST"
