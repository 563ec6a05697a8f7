#!/bin/bash
# Round-4 TPU queue, part I — QAT with distillation (KL to the source
# fp32 logits): the direct training analogue of the decode gate.
set -x
LOG=results/tpu_queue_r4i.log
{
  echo "=== tpu_queue_r4i $(date -u) ==="

  echo "--- 1. QAT-KD finetune: mixed48, 1000 steps ---"
  timeout 3600 python scripts/qat_finetune.py --recipe mixed48 --distill \
      --steps 1000 --out_dir results/qat_kd_mixed48 2>&1 | tail -14

  echo "--- 2. decode gate on QAT-KD-mixed48 ---"
  timeout 5400 python scripts/decode_gate.py \
      --model_dir results/qat_kd_mixed48/block_main_b4_5 \
      --only mixed48_int8kv \
      --out results/decode_gate_qat_kd_mixed48.json 2>&1 | tail -6

  echo "--- 3. held-out ppl gate (CPU) ---"
  timeout 3600 python scripts/qat_ppl_gate.py \
      --qat_dir results/qat_kd_mixed48 \
      --out results/qat_ppl_kd_mixed48.json 2>&1 | tail -8

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
