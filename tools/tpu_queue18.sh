#!/bin/bash
# Round-4 TPU queue #18 (chained on queue 17's bash PID): the blocked
# copy-layout A/B (VERDICT #1), the full 10-line roofline bench
# (VERDICT #2+#6, doubles as the driver-bench compile warmup), the
# full-size GPS quality runs (VERDICT #7), the compressed-pool t2@160k
# data-scaling point (VERDICT #4), and a PPGN t4@10k follow-up if time
# remains.
cd /root/repo
mkdir -p results results_archive

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 18:15:00' +%s)}"
ST=/tmp/tpu_queue18.status

archive() {
  local name="$1" rd="$2"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
  if [ -n "$rd" ] && [ -d "$rd" ]; then
    [ -f "$rd/log.txt" ] && gzip -c "$rd/log.txt" \
        > "results_archive/$name/log.txt.gz"
    for f in config.json cmd_input.txt; do
      [ -f "$rd/$f" ] && cp "$rd/$f" "results_archive/$name/"
    done
  fi
}

run_if() {
  local est="$1" name="$2" rd="$3"; shift 3
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt "$est" ]; then
    echo "SKIP $name (need ${est}s, have ${rem}s)" >> "$ST"
    return
  fi
  echo "START $name $(date -u +%H:%M:%S)" >> "$ST"
  timeout "$est" "$@" > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> "$ST"
  archive "$name" "$rd"
}

run_if 1800 copy_layout_ab "" \
  python -u tools/copy_layout_ab.py
run_if 3000 bench_r4 "" python -u bench.py
run_if 4500 gps_pepstruct_full results/gps_pepstruct_full \
  python -u run_gps.py --cfg configs/gps/peptides-struct-GPS.yaml \
    dataset.num_graphs 2400 train.epochs 200 \
    out_dir results/gps_pepstruct_full
run_if 1500 gps_cora results/gps_cora \
  python -u run_gps.py --cfg configs/gps/cora-GPS.yaml \
    out_dir results/gps_cora
run_if 6000 ccyc_t2_n160k results/ccyc_t2_n160k \
  python -u run_graphcount.py --target 2 --h 2 --batch_size 128 \
    --lr 5e-3 --epochs 1500 --num_graphs 160000 --compress_pools \
    --num_workers 2 --res_dir results/ccyc_t2_n160k
run_if 3600 cgra_t4_ppgn_n10k results/cgra_t4_ppgn_n10k \
  python -u run_graphcount.py --dataset count_graphlet --model PPGN_eff \
    --target 4 --h 4 --batch_size 128 --lr 5e-4 --lr_decay_factor 0.8 \
    --patience 30 --grad_clip 1.0 --epochs 900 --num_graphs 10000 \
    --num_workers 2 --res_dir results/cgra_t4_ppgn_n10k
echo TPU_QUEUE18_ALL_DONE >> "$ST"
