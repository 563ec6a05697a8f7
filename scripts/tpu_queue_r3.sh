#!/bin/bash
# Round-3 TPU queue — remaining items (most of the original queue ran in
# the 2026-08-20 session; see git log / RESULTS.md):
#   DONE: prefill decomposition probe (+ fresh-KV prefill raced in,
#         -15%, now default), 10k TPU train (block+vanilla), quality
#         phases 3-6 on the TPU checkpoints, W8A8 decode gate (FAILED ->
#         default reverted to 2048), checkpoint eval sweep.
#   ABORTED by a TPU-tunnel outage at ~04:30 UTC (device wedged
#   mid-train on the pg model; health matmul unresponsive >15 min):
#   the items below.
# Runs serially on the single-client chip; each step bounded so one
# hang can't eat the rest.
set -x
LOG=results/tpu_queue_r3.log
mkdir -p results
{
  echo "=== tpu_queue_r3 $(date -u) ==="

  echo "--- 1. pg5m train (real-task fixture model, 3k steps) ---"
  timeout 7200 python scripts/quality_run.py --corpus /root/corpus/pgbytes \
      --out results/pgq --steps 3000 --batch 64 --block_only --train_only \
      2>&1 | tail -4

  echo "--- 2. real-task fixture eval at fp32/int8/int4 ---"
  timeout 5400 python scripts/real_task_eval.py \
      --model_dir results/pgq/block_main_b4_5 \
      --out results/real_tasks 2>&1 | tail -20

  echo "--- 3. paged retile race (VERDICT #4: target >=2100 tok/s at d64) ---"
  timeout 3600 python bench.py --engine --engine_kv paged --decode 64 \
      --detail_out BENCH_DETAIL_paged_r3.json 2>&1 | tail -8

  echo "--- 4. headline bench + latency-mode row + MFU fields ---"
  timeout 5400 python bench.py --engine \
      --detail_out BENCH_DETAIL_r3.json 2>&1 | tail -10

  echo "--- 5. fresh-prefill headline A/B (BT_FRESH_PREFILL=0 control) ---"
  BT_FRESH_PREFILL=0 timeout 3600 python bench.py \
      --detail_out BENCH_DETAIL_nofresh.json 2>&1 | tail -4

  echo "--- 6. driver entry compile check ---"
  timeout 2400 python __graft_entry__.py 2>&1 | tail -4

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
tail -5 "$LOG"
