#!/bin/bash
# Round-5 CPU queue: quality rows for the NEW verticals (link
# prediction + WikipediaNetwork) trained on the host CPU — quality
# rows don't need the chip (precedent: round-4 GPS zoo-tail rows).
cd /root/repo
echo $$ > /tmp/cpuq_r5.pid
mkdir -p results results_archive
ST=/tmp/cpu_queue_r5.status

archive() {
  local name="$1"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
  # run_gps writes a timestamped dir under out_dir with config + agg
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

run1 7200 gps_contact python -u run_gps.py --cfg configs/gps/contact-GPS.yaml
run1 3600 gps_chameleon python -u run_gps.py --cfg configs/gps/chameleon-GPS.yaml
echo CPU_QUEUE_R5_DONE >> "$ST"
