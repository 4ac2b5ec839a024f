#!/bin/bash
# Round-4 CPU queue: GPS zoo-tail quality rows (VERDICT r03 weak #6 /
# next-round #7b) trained on the host CPU — quality metrics don't need
# the chip, and the chip is busy with queue 19's perf/data-scaling runs.
# Serial; each run archives stdout + log into results_archive/.
cd /root/repo
mkdir -p results results_archive
ST=/tmp/cpu_queue_gps.status

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

run1() {
  local est="$1" name="$2" rd="$3"; shift 3
  echo "START $name $(date -u +%H:%M:%S)" >> "$ST"
  JAX_PLATFORMS=cpu timeout "$est" "$@" > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> "$ST"
  archive "$name" "$rd"
}

run1 7200 gps_cora results/gps_cora \
  python -u run_gps.py --cfg configs/gps/cora-GPS.yaml \
    out_dir results/gps_cora
run1 4800 gps_aqsol results/gps_aqsol \
  python -u run_gps.py --cfg configs/gps/aqsol-GPS.yaml \
    out_dir results/gps_aqsol
run1 9000 gps_mnist results/gps_mnist \
  python -u run_gps.py --cfg configs/gps/mnist-GPS.yaml \
    out_dir results/gps_mnist
echo CPU_QUEUE_GPS_ALL_DONE >> "$ST"
