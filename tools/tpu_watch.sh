#!/bin/bash
# Probe TPU health periodically; when healthy, run validation + bench.
# Logs to tpu_watch.log. One TPU process at a time (this script owns the slot).
cd /root/repo
LOG=tpu_watch.log
echo "=== watcher start $(date -u +%H:%M:%S) ===" >> $LOG
for i in $(seq 1 30); do
  # TPU-slot handshake: a full bench run (ours or the driver's) owns
  # the slot via .bench_lock — skip the probe while it is fresh.
  if [ -f .bench_lock ] && [ $(( $(date +%s) - $(stat -c %Y .bench_lock) )) -lt 2400 ]; then
    echo "--- probe $i skipped (bench running)" >> $LOG
    sleep 600
    continue
  fi
  echo "--- probe $i $(date -u +%H:%M:%S)" >> $LOG
  touch .probe_lock
  OUT=$(timeout 480 python bench.py --stage canary 2>>$LOG)
  rm -f .probe_lock
  echo "$OUT" >> $LOG
  TFLOPS=$(echo "$OUT" | python -c "import sys,json;
try: print(json.loads(sys.stdin.read().strip().splitlines()[-1]).get('canary_tflops',0))
except Exception: print(0)")
  HEALTHY=$(python -c "print(1 if float('$TFLOPS' or 0) > 50 else 0)")
  if [ "$HEALTHY" = "1" ]; then
    echo "HEALTHY ($TFLOPS TFLOPs) — validating" >> $LOG
    timeout 900 python tools/tpu_validate.py >> $LOG 2>&1
    echo "--- fastpath A/B $(date -u +%H:%M:%S)" >> $LOG
    timeout 900 python tools/tpu_ab_fastpath.py >> $LOG 2>&1
    echo "fastpath A/B rc=$?" >> $LOG
    echo "--- bench run $(date -u +%H:%M:%S)" >> $LOG
    BENCH_DEADLINE_S=1500 timeout 1700 python bench.py > BENCH_TPU_HEALTHY.json 2>>$LOG
    echo "bench rc=$?" >> $LOG
    cat BENCH_TPU_HEALTHY.json >> $LOG
    echo "=== watcher done (healthy path) ===" >> $LOG
    exit 0
  fi
  sleep 600
done
echo "=== watcher gave up after 12 probes ===" >> $LOG
exit 1
