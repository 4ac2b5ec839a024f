#!/bin/bash
# Round-5 CPU queue #2: longer contact link-prediction run (the 60-ep
# row ended with best val at its LAST epoch — still improving) and the
# num-atoms inductive size split.
cd /root/repo
echo $$ > /tmp/cpuq_r5b.pid
mkdir -p results results_archive
ST=/tmp/cpu_queue_r5b.status

archive() {
  local name="$1"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
  local rd
  rd=$(ls -dt results/${name}_dir/* 2>/dev/null | head -1)
  if [ -n "$rd" ] && [ -d "$rd" ]; then
    for f in config.yaml agg.json; do
      [ -f "$rd/$f" ] && cp "$rd/$f" "results_archive/$name/"
    done
  fi
}

run1() {
  local est="$1" name="$2"; shift 2
  echo "START $name $(date -u +%H:%M:%S)" >> "$ST"
  JAX_PLATFORMS=cpu timeout "$est" "$@" \
      out_dir "results/${name}_dir" > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> "$ST"
  archive "$name"
}

run1 7200 gps_contact_long python -u run_gps.py \
    --cfg configs/gps/contact-GPS.yaml train.epochs 200
run1 3600 gps_contact_numatoms python -u run_gps.py \
    --cfg configs/gps/contact-GPS.yaml \
    dataset.name pcqm4mv2contact-num-atoms train.epochs 80
run1 3600 gps_pcqm4mv2_subset python -u run_gps.py \
    --cfg configs/gps/pcqm4mv2-GPS.yaml dataset.num_graphs 1000 \
    train.epochs 40
echo CPU_QUEUE_R5B_DONE >> "$ST"
