#!/bin/bash
# Round-4 queue Q: the 85M ladder's missing headline combo, the final
# headline race, and the fixed 85M QAT-KD.
set -x
LOG=results/tpu_queue_r4q.log
{
  echo "=== tpu_queue_r4q $(date -u) ==="

  echo "--- 1. 85M gate: w8a8 + int4kv (the headline combination) ---"
  timeout 7200 python scripts/decode_gate.py --model block_main_b4_85 \
      --model_dir results/scale85/block_main_b4_85 --w8a8 \
      --only w8a8_int8w_int4kv --merge \
      --out results/decode_gate_85m.json 2>&1 | tail -5

  echo "--- 2. final headline race: fresh + W8A8-384 + INT4 KV ---"
  timeout 7200 python bench.py --kv int4 \
      --detail_out BENCH_DETAIL_r4_final.json 2>&1 | tail -6

  echo "--- 3. QAT-KD mixed48 at 85M (teacher-as-arg fix) ---"
  timeout 7200 python scripts/qat_finetune.py --model block_main_b4_85 \
      --model_dir results/scale85/block_main_b4_85 --recipe mixed48 \
      --distill --steps 1000 --batch 32 \
      --out_dir results/qat_kd_mixed48_85m 2>&1 | tail -8

  echo "--- 4. decode gate on QAT-KD-mixed48 at 85M ---"
  timeout 7200 python scripts/decode_gate.py --model block_main_b4_85 \
      --model_dir results/qat_kd_mixed48_85m/block_main_b4_85 \
      --only mixed48_int8kv \
      --out results/decode_gate_qat_kd_mixed48_85m.json 2>&1 | tail -5

  echo "--- 5. held-out ppl gate at 85M (TPU eval) ---"
  BT_CPU=0 timeout 7200 python scripts/qat_ppl_gate.py \
      --model block_main_b4_85 \
      --qat_dir results/qat_kd_mixed48_85m \
      --baseline_dir results/scale85/block_main_b4_85 \
      --out results/qat_ppl_kd_mixed48_85m.json 2>&1 | tail -8

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
