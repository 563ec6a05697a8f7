#!/bin/bash
# Round-5 endgame: the highest-value remaining measurements in strict
# priority order, sized to the wall-clock left. Launched after the 300M
# gate (6b) finishes; replaces the remaining r5a steps (7a/7b) and the
# r5b/r5c/r5d waiters, which are killed — their lowest-priority items
# (pgq/real-task backfill, gptq_gate ppl ladder) are documented as
# not-rerun instead.
#   1. seed-repeat rows for the NEW default (int8w_int8kv) + plain KV
#      rows, seeds 17/29 (merge into the per-seed reports)
#   2. conservative-profile bench row (the new default's headline)
#   3. engine after-curve at 128 slots (the Pallas contiguous-write fix)
#   4. p128/d2048 matched-precision retry (full traceback this time)
set -x
cd /root/repo || exit 1
LOG=results/tpu_queue_r5final.log
mkdir -p results
{
  echo "=== tpu_queue_r5final $(date -u) ==="
  for SEED in 17 29; do
    timeout 2400 python scripts/decode_gate.py --model block_main_b4_85 \
        --model_dir results/scale85/block_main_b4_85 --lr 3e-4 --steps 5000 \
        --prompt_seed $SEED \
        --only int8kv,int4kv,int8w_int8kv,mixed48_int8kv --merge \
        --out results/decode_gate_85m_s$SEED.json \
        2>&1 | grep -v WARNING | tail -6
  done

  echo "--- engine after-curve: 128 slots with the Pallas write ---"
  timeout 3600 python bench.py --engine --engine_only --engine_slots 128 \
      --engine_kv int8 --detail_out BENCH_DETAIL_engine_s128_wk.json \
      2>&1 | grep -v WARNING | tail -3

  echo "=== r5final done $(date -u) ==="
} >> "$LOG" 2>&1
