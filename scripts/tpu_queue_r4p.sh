#!/bin/bash
# Round-4 TPU queue, part P — the scale question: train block_main_b4_85
# on-chip and measure the quantization gate ladder at 16x the params.
set -x
LOG=results/tpu_queue_r4p.log
{
  echo "=== tpu_queue_r4p $(date -u) ==="

  echo "--- 1. train block_main_b4_85, 5000 steps (~35 min) ---"
  timeout 7200 python scripts/train_ckpt.py --model block_main_b4_85 \
      --steps 5000 --batch 32 --out results/scale85 2>&1 | tail -8

  echo "--- 2. decode gate ladder at 85M (RTN rows) ---"
  timeout 10800 python scripts/decode_gate.py --model block_main_b4_85 \
      --model_dir results/scale85/block_main_b4_85 --w8a8 \
      --only int8kv,int4kv,int8w_int8kv,int8w_int4kv,mixed48_int8kv,int4w_int8kv,w8a8_int8w_int8kv \
      --out results/decode_gate_85m.json 2>&1 | tail -12

  echo "--- 3. QAT-KD mixed48 at 85M (1000 steps) ---"
  timeout 7200 python scripts/qat_finetune.py --model block_main_b4_85 \
      --model_dir results/scale85/block_main_b4_85 --recipe mixed48 \
      --distill --steps 1000 --batch 32 \
      --out_dir results/qat_kd_mixed48_85m 2>&1 | tail -10

  echo "--- 4. decode gate on QAT-KD-mixed48 at 85M ---"
  timeout 7200 python scripts/decode_gate.py --model block_main_b4_85 \
      --model_dir results/qat_kd_mixed48_85m/block_main_b4_85 \
      --only mixed48_int8kv \
      --out results/decode_gate_qat_kd_mixed48_85m.json 2>&1 | tail -6

  echo "--- 5. held-out ppl gates at 85M (TPU eval) ---"
  BT_CPU=0 timeout 7200 python scripts/qat_ppl_gate.py \
      --model block_main_b4_85 \
      --qat_dir results/qat_kd_mixed48_85m \
      --baseline_dir results/scale85/block_main_b4_85 \
      --out results/qat_ppl_kd_mixed48_85m.json 2>&1 | tail -10

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
