#!/bin/bash
# Round-4 TPU queue, part A — the round-3 items aborted by the tunnel
# outage that do NOT depend on round-4 code changes. Runs serially on
# the single-client chip; each step bounded so one hang can't eat the
# rest. Part B (headline bench with latency row + engine MFU at the
# headline batch, paged re-race after row batching) runs after the
# round-4 bench/kernel changes land.
set -x
LOG=results/tpu_queue_r4a.log
mkdir -p results
{
  echo "=== tpu_queue_r4a $(date -u) ==="

  echo "--- 1. real-task fixture eval on the in-domain pg model (fp32/int8/int4) ---"
  timeout 5400 python scripts/real_task_eval.py \
      --model_dir results/pgq/block_main_b4_5 \
      --out results/real_tasks 2>&1 | tail -25

  echo "--- 2. paged retile race, round-3 code (VERDICT r3 item 1: backfill BENCH_DETAIL_paged_r3) ---"
  timeout 3600 python bench.py --engine --engine_kv paged --decode 64 \
      --detail_out BENCH_DETAIL_paged_r3.json 2>&1 | tail -8

  echo "--- 3. fresh-prefill headline A/B control (BT_FRESH_PREFILL=0) ---"
  BT_FRESH_PREFILL=0 timeout 4500 python bench.py \
      --detail_out BENCH_DETAIL_nofresh.json 2>&1 | tail -4

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
tail -5 "$LOG"
