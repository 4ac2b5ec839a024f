#!/bin/bash
# Round-3 TPU queue: the VERDICT.md round-3 quality/evidence items.
#   1-4. GPS attention-zoo on-TPU smokes (performer/graphormer/san/
#        bigbird) — compile + short loss curve each (VERDICT "weak" #7).
#   5.   GPS quality row #2: full molhiv-GPS training run ("weak" #8).
#   6.   PPGN_eff count_cycle t0 retune — lr/schedule tuned for the
#        dense family + 5000 graphs (the r02 run trained on the 1500
#        default and bottomed its LR; "weak" #3). Target <=1e-2.
#   7.   count_cycle t2 @ 80k with the gentler plateau decay the 80k
#        run was schedule-limited by ("next" #3a). Target <=1e-2.
#   8.   count_graphlet t4 non-data lever: h=5 ("next" #3b).
# Deadline-guarded so the chip is free for the end-of-round bench.
cd /root/repo
mkdir -p results results_archive

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 10:15:00' +%s)}"
ST=/tmp/tpu_queue7.status

archive() {
  local name="$1" rd="$2"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
  if [ -n "$rd" ] && [ -d "$rd" ]; then
    [ -f "$rd/log.txt" ] && gzip -c "$rd/log.txt" \
        > "results_archive/$name/log.txt.gz"
    for f in config.json cmd_input.txt agg.json config.yaml; do
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

run_if 1200 gps_performer_smoke results/gps_performer_smoke \
  python -u run_gps.py --cfg configs/gps/zinc-GPS.yaml \
    model.global_model performer train.epochs 5 \
    out_dir results/gps_performer_smoke
run_if 1200 gps_graphormer_smoke results/gps_graphormer_smoke \
  python -u run_gps.py --cfg configs/gps/zinc-GPS-graphormer.yaml \
    train.epochs 5 out_dir results/gps_graphormer_smoke
run_if 1200 gps_san_smoke results/gps_san_smoke \
  python -u run_gps.py --cfg configs/gps/zinc-GPS-san.yaml \
    train.epochs 5 out_dir results/gps_san_smoke
run_if 1200 gps_bigbird_smoke results/gps_bigbird_smoke \
  python -u run_gps.py --cfg configs/gps/zinc-GPS-bigbird.yaml \
    train.epochs 5 out_dir results/gps_bigbird_smoke
run_if 4800 gps_molhiv_canonical results/gps_molhiv_canonical \
  python -u run_gps.py --cfg configs/gps/molhiv-GPS.yaml \
    out_dir results/gps_molhiv_canonical
run_if 6600 count_cycle_t0_ppgn_tuned results/count_cycle_t0_ppgn_tuned \
  python -u run_graphcount.py --model PPGN_eff --target 0 --h 3 \
    --batch_size 128 --lr 2e-3 --lr_decay_factor 0.7 --patience 20 \
    --epochs 1500 --num_graphs 5000 --num_workers 2 \
    --res_dir results/count_cycle_t0_ppgn_tuned
run_if 4500 ccyc_t2_n80k_retune results/ccyc_t2_n80k_retune \
  python -u run_graphcount.py --target 2 --h 2 --batch_size 128 \
    --lr 5e-3 --lr_decay_factor 0.95 --patience 20 --epochs 2000 \
    --num_graphs 80000 --num_workers 2 \
    --res_dir results/ccyc_t2_n80k_retune
run_if 6000 cgra_t4_h5_n20k results/cgra_t4_h5_n20k \
  python -u run_graphcount.py --dataset count_graphlet --target 4 --h 5 \
    --batch_size 32 --lr 5e-3 --epochs 1200 --num_graphs 20000 \
    --num_workers 2 --res_dir results/cgra_t4_h5_n20k
echo TPU_QUEUE7_ALL_DONE >> "$ST"
