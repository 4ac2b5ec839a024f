#!/bin/bash
# Round-5 TPU queue #25 — first trained-to-quality rows for the five
# never-trained zoo models (VERDICT r04 weak #2 / next #2):
#   * NGNN + I2GNN node-level 3-cycle counting (run_zinc_cycle t0 —
#     both are provably cycle counters; flagship row: 0.00033 MAE)
#   * kGNN k123 on the QM9 t0 canonical recipe (flagship row: 0.339)
#   * OgbGNN / GINE+ / NestedPPGN on the LEARNABLE molhiv-shaped
#     stand-in (--synth_label tri: triangle count > dataset median,
#     inside ESC's provable counting power — the historical parity
#     label was shown near-unlearnable in round 3)
cd /root/repo
echo $$ > /tmp/q25.pid
mkdir -p results results_archive

DEADLINE="${DEADLINE:-$(date -ud '2026-08-22 02:30:00' +%s)}"
ST=/tmp/tpu_queue25.status

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
  timeout "$est" "$@" --res_dir "results/$name" \
      > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> "$ST"
  archive "$name"
  sleep 90
}

run_if 2400 zc_ngnn_t0 python -u run_zinc_cycle.py --model NGNN \
    --target 0 --num_graphs 4000 --epochs 200 --lr 1e-3
run_if 3600 zc_i2gnn_t0 python -u run_zinc_cycle.py --model I2GNN \
    --target 0 --num_graphs 4000 --epochs 200 --lr 1e-3
run_if 3600 qm9_k123_t0 python -u run_qm9.py --model k123_GNN \
    --target 0 --num_graphs 5000 --epochs 250
run_if 1800 ogb_tri_gnn python -u run_ogb_mol.py --model GNN \
    --synth_label tri --num_graphs 2000 --epochs 60 --drop_ratio 0.5
run_if 1800 ogb_tri_ginep python -u run_ogb_mol.py --model GINEPlus \
    --synth_label tri --num_graphs 2000 --epochs 60 \
    --emb_dim 100 --drop_ratio 0.2 --multihop_k 3
run_if 2400 ogb_tri_nppgn python -u run_ogb_mol.py --model NestedPPGN \
    --synth_label tri --num_graphs 2000 --epochs 60 \
    --emb_dim 64 --num_layer 2 --h 3 --drop_ratio 0.2
echo TPU_QUEUE25_ALL_DONE >> "$ST"
