#!/bin/bash
# Round-5 TPU queue #26 (chained on queue 25 via WAIT_PID):
#   1. zc_i2gnn_t0 re-run (queue-25 casualty: it launched during a
#      transient syntax-error window in molecules.py, rc=1 in 2s)
#   2. PPGN pooling A/B (bf16-read xla vs Pallas kernel — VERDICT #1)
#   3. bucketed copy-layout A/B (VERDICT #3)
#   4. flagship bf16-moments A/B (VERDICT #9)
#   5. PPGN t4@10k to schedule completion (VERDICT #5)
#   6. bench_r5 full run
cd /root/repo
echo $$ > /tmp/q26.pid
mkdir -p results results_archive

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  sleep 90
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-22 02:40:00' +%s)}"
ST=/tmp/tpu_queue26.status

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

run_if 3600 zc_i2gnn_t0 python -u run_zinc_cycle.py --model I2GNN \
    --target 0 --num_graphs 4000 --epochs 200 --lr 1e-3 \
    --res_dir results/zc_i2gnn_t0
run_if 1800 ppgn_pool_ab python -u tools/ppgn_pool_ab.py
AB_BUCKETED_ONLY=1 run_if 1800 copy_ab_bucketed \
    python -u tools/copy_layout_ab.py
run_if 1500 flagship_bf16_ab python -u tools/flagship_bf16_ab.py
run_if 9000 cgra_t4_ppgn_n10k_full python -u run_graphcount.py \
    --dataset count_graphlet --target 4 --h 4 --model PPGN_eff \
    --num_graphs 10000 --batch_size 128 --lr 5e-4 \
    --lr_decay_factor 0.8 --patience 30 --grad_clip 1.0 \
    --epochs 1400 --res_dir results/cgra_t4_ppgn_n10k_full
run_if 3300 bench_r5 python -u bench.py
echo TPU_QUEUE26_ALL_DONE >> "$ST"
