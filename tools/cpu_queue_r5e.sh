#!/bin/bash
# Round-5 CPU queue #5 (chained on r5d): contact link prediction with
# RWSE on top of LapPE — return-probability features sharpen the
# backbone-offset signal the dot decoder ranks on.
cd /root/repo
echo $$ > /tmp/cpuq_r5e.pid
mkdir -p results results_archive
ST=/tmp/cpu_queue_r5e.status

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

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

run1 7200 gps_contact_rwse python -u run_gps.py \
    --cfg configs/gps/contact-GPS.yaml train.epochs 150 \
    model.use_rwse true
echo CPU_QUEUE_R5E_DONE >> "$ST"
