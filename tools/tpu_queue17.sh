#!/bin/bash
# Round-4 TPU queue #17: the three self-contained VERDICT r03 runs that
# need no new code — CSL at the reference's 10-fold protocol (item 9),
# and PPGN_eff on the two out-of-power targets (item 3): graphlet t4
# (triangle-rectangle; flagship best 0.1243 normalized, memorization-
# limited) and cycle t3 (6-cycles; flagship 0.0245@5k). Recipe is the
# proven stable one from round 3 (lr 5e-4 + grad_clip 1.0), with a
# gentler plateau decay (factor 0.8 / patience 30) because the t2 run's
# factor-0.7/patience-25 schedule bottomed the LR by epoch 500.
cd /root/repo
mkdir -p results results_archive

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 14:50:00' +%s)}"
ST=/tmp/tpu_queue17.status

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

run_if 2400 csl_canonical10 "" \
  python -u run_csl.py --folds 10
run_if 4800 cgra_t4_ppgn results/cgra_t4_ppgn \
  python -u run_graphcount.py --dataset count_graphlet --model PPGN_eff \
    --target 4 --h 4 --batch_size 128 --lr 5e-4 --lr_decay_factor 0.8 \
    --patience 30 --grad_clip 1.0 --epochs 1200 --num_graphs 5000 \
    --num_workers 2 --res_dir results/cgra_t4_ppgn
run_if 4800 ccyc_t3_ppgn results/ccyc_t3_ppgn \
  python -u run_graphcount.py --model PPGN_eff --target 3 --h 3 \
    --batch_size 128 --lr 5e-4 --lr_decay_factor 0.8 --patience 30 \
    --grad_clip 1.0 --epochs 1200 --num_graphs 5000 \
    --num_workers 2 --res_dir results/ccyc_t3_ppgn
echo TPU_QUEUE17_ALL_DONE >> "$ST"
