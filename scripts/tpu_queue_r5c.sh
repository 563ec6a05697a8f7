#!/bin/bash
# Round-5 queue, part C: supplement the seed-17/29 gate runs with the two
# borderline rows the r5a --only list paired with the wrong KV mode
# (VERDICT r4 named mixed48 +0.591 and gptq_mixed48 +0.450 — both are
# the *int8-KV* pairings). --merge appends to the per-seed reports.
set -x
cd /root/repo || exit 1
LOG=results/tpu_queue_r5c.log
mkdir -p results
{
  echo "=== tpu_queue_r5c $(date -u) ==="
  while pgrep -f "tpu_queue_r5[ab].sh" >/dev/null; do
    sleep 60
  done
  echo "--- chip free $(date -u) ---"
  for SEED in 17 29; do
    timeout 5400 python scripts/decode_gate.py --model block_main_b4_85 \
        --model_dir results/scale85/block_main_b4_85 --lr 3e-4 --steps 5000 \
        --prompt_seed $SEED \
        --only int8kv,int4kv,int8w_int8kv,mixed48_int8kv --merge \
        --out results/decode_gate_85m_s$SEED.json \
        2>&1 | grep -v WARNING | tail -5
  done
  echo "--- conservative-profile bench row (int8 KV + pairing-aware W8A8) ---"
  timeout 5400 python bench.py --kv int8 \
      --detail_out BENCH_DETAIL_default_int8kv_r5.json 2>&1 \
      | grep -v WARNING | tail -4

  echo "=== r5c done $(date -u) ==="
} >> "$LOG" 2>&1
