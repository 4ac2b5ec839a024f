#!/bin/bash
# Poll the TPU grant; when it answers, run the queued work once.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "TPU BACK at $(date)" > /tmp/tpu_watch.status
    bash /tmp/tpu_queue.sh
    exit 0
  fi
  echo "probe $i down $(date)" >> /tmp/tpu_watch.log
  sleep 180
done
echo "TPU never returned" > /tmp/tpu_watch.status
