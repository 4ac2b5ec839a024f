#!/bin/bash
# Round-4 TPU queue #19: re-run of queue 18 after the machine restart
# wiped /tmp and results/ (queue 17 had landed: csl_canonical10 +
# cgra_t4_ppgn). Serial on the single chip, deadline-guarded:
#  1. copy_layout_ab       — VERDICT r03 #1 evidence (BASELINE cites it)
#  2. bench_r4             — 10-line roofline bench (VERDICT #2+#6),
#                            doubles as driver-bench compile warmup
#  3. ccyc_t2_n160k        — compressed-pool data-scaling point
#                            (VERDICT #4; featurization pre-built on CPU
#                            by tools/prep_t2_160k.sh)
#  4. ccyc_t3_ppgn         — PPGN_eff on 6-cycles (VERDICT #3 2nd half)
#  5. gps_pepstruct_full   — full-size GPS quality row (VERDICT #7)
#  6. gps_cora             — zoo-tail GPS quality row (VERDICT #7)
cd /root/repo
mkdir -p results results_archive

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 19:05:00' +%s)}"
ST=/tmp/tpu_queue19.status

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

run_if 2100 copy_layout_ab "" \
  python -u tools/copy_layout_ab.py
run_if 3000 bench_r4 "" python -u bench.py
# wait for the CPU-side featurization prep (cache file appears) so the
# chip is not idle behind a 40-min featurize
for i in $(seq 1 90); do
  ls data/count_cycle/*n160000* >/dev/null 2>&1 && break
  [ -f /tmp/prep160k.done ] && break
  sleep 30
done
run_if 6600 ccyc_t2_n160k results/ccyc_t2_n160k \
  python -u run_graphcount.py --target 2 --h 2 --batch_size 128 \
    --lr 5e-3 --epochs 1200 --num_graphs 160000 --compress_pools \
    --num_workers 2 --res_dir results/ccyc_t2_n160k
run_if 4200 ccyc_t3_ppgn results/ccyc_t3_ppgn \
  python -u run_graphcount.py --model PPGN_eff --target 3 --h 3 \
    --batch_size 128 --lr 5e-4 --lr_decay_factor 0.8 --patience 30 \
    --grad_clip 1.0 --epochs 1200 --num_graphs 5000 \
    --num_workers 2 --res_dir results/ccyc_t3_ppgn
run_if 4500 gps_pepstruct_full results/gps_pepstruct_full \
  python -u run_gps.py --cfg configs/gps/peptides-struct-GPS.yaml \
    dataset.num_graphs 2400 train.epochs 200 \
    out_dir results/gps_pepstruct_full
run_if 1500 gps_cora results/gps_cora \
  python -u run_gps.py --cfg configs/gps/cora-GPS.yaml \
    out_dir results/gps_cora
echo TPU_QUEUE19_ALL_DONE >> "$ST"
