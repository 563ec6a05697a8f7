#!/bin/bash
# Round-5 TPU queue, part B — runs after tpu_queue_r5a.sh finishes.
#   1. retry the p128/d2048 matched-precision bench (r5a's attempt died
#      with its traceback swallowed by tail; full log this time)
#   2. paged admission decomposition probe (VERDICT r4 item 8)
#   3. engine_cpu_ratio re-run on a quiet host (the earlier one ran
#      while the trainer was feeding and measured noisy declining reps)
set -x
cd /root/repo || exit 1
LOG=results/tpu_queue_r5b.log
mkdir -p results
{
  echo "=== tpu_queue_r5b $(date -u) ==="
  while pgrep -f "tpu_queue_r5a.sh" >/dev/null; do
    sleep 60
  done
  echo "--- r5a done, chip free $(date -u) ---"

  echo "--- 1. bench p128/d2048 retry (full log) ---"
  timeout 5400 python bench.py --prefill 128 --decode 2048 \
      --detail_out BENCH_DETAIL_vanilla_int8_d2048.json 2>&1 \
      | grep -v WARNING | tail -40

  echo "--- 2. paged admit probe ---"
  timeout 5400 python scripts/paged_admit_probe.py \
      --out results/paged_admit_probe.json 2>&1 | grep -v WARNING | tail -12

  echo "--- 3. engine_cpu_ratio on a quiet host ---"
  timeout 3600 python scripts/engine_cpu_ratio.py \
      --out results/engine_cpu_ratio.json 2>&1 | grep -v WARNING | tail -3

  echo "=== r5b done $(date -u) ==="
} >> "$LOG" 2>&1
