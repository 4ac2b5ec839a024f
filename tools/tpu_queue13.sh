#!/bin/bash
# Round-3 TPU queue, extra quality (chip free after queue12): spend the
# remaining window deepening the quality story.
#   1. PPGN_eff count_cycle t1 (4-cycles) with the proven round-3
#      recipe (5000 graphs, lr 2e-3, grad_clip 1.0).
#   2. molhiv-GPS at 2000 graphs / 100 epochs (the 600-graph row sits
#      at 0.56 AUC; more data + epochs for a stronger second row).
cd /root/repo
mkdir -p results results_archive

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 10:20:00' +%s)}"
ST=/tmp/tpu_queue13.status

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

run_if 3600 count_cycle_t1_ppgn_clip results/count_cycle_t1_ppgn_clip \
  python -u run_graphcount.py --model PPGN_eff --target 1 --h 3 \
    --batch_size 128 --lr 2e-3 --lr_decay_factor 0.7 --patience 20 \
    --grad_clip 1.0 --epochs 900 --num_graphs 5000 --num_workers 2 \
    --res_dir results/count_cycle_t1_ppgn_clip
run_if 4500 gps_molhiv_2k results/gps_molhiv_2k \
  python -u run_gps.py --cfg configs/gps/molhiv-GPS.yaml \
    dataset.num_graphs 2000 train.epochs 100 \
    out_dir results/gps_molhiv_2k
echo TPU_QUEUE13_ALL_DONE >> "$ST"
