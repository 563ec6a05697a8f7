#!/bin/bash
# Round-4 TPU queue, part F — QAT: finetune with the deployment grid in
# the loss (straight-through fake-quant), then gate the RTN-quantized
# adapted weights under the uniform decode gate + held-out ppl.
set -x
LOG=results/tpu_queue_r4f.log
{
  echo "=== tpu_queue_r4f $(date -u) ==="

  echo "--- 1. QAT finetune: mixed48 (serving recipe), 1000 steps ---"
  timeout 3600 python scripts/qat_finetune.py --recipe mixed48 \
      --steps 1000 --out_dir results/qat_mixed48 2>&1 | tail -14

  echo "--- 2. QAT finetune: whole-model int4 g128, 1000 steps ---"
  timeout 3600 python scripts/qat_finetune.py --recipe int4g128 \
      --steps 1000 --out_dir results/qat_int4g128 2>&1 | tail -14

  echo "--- 3. decode gate on QAT-mixed48 (TPU workers) ---"
  timeout 5400 python scripts/decode_gate.py \
      --model_dir results/qat_mixed48/block_main_b4_5 \
      --only mixed48_int8kv \
      --out results/decode_gate_qat_mixed48.json 2>&1 | tail -6

  echo "--- 4. decode gate on QAT-int4g128 (TPU workers) ---"
  timeout 5400 python scripts/decode_gate.py \
      --model_dir results/qat_int4g128/block_main_b4_5 \
      --only int4w_int8kv \
      --out results/decode_gate_qat_int4g128.json 2>&1 | tail -6

  echo "--- 5. held-out ppl gates (CPU) ---"
  timeout 3600 python scripts/qat_ppl_gate.py --qat_dir results/qat_mixed48 2>&1 | tail -8
  timeout 3600 python scripts/qat_ppl_gate.py --qat_dir results/qat_int4g128 2>&1 | tail -8

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
