#!/bin/bash
# Round-4 TPU queue, part D — after the uniform decode gate completed and
# the defaults were re-derived from it (QUALITY.md "ONE decode-path gate"):
#   1. supplement gate rows: the INT4-weight recipes paired with the
#      PASSing KV precision (mixed48+int8KV, GPTQ-mixed48+int8KV) —
#      merged into results/decode_gate.json
#   2. headline bench under the NEW gate-derived defaults
#      (kv=int8, BT_W8A8_M_MIN=384) -> BENCH_DETAIL_r4_default.json
set -x
LOG=results/tpu_queue_r4d.log
mkdir -p results
{
  echo "=== tpu_queue_r4d $(date -u) ==="

  echo "--- 1. supplement gate rows (int8kv pairings of the INT4-weight recipes) ---"
  timeout 7200 python scripts/decode_gate.py --gptq \
      --only mixed48_int8kv,gptq_mixed48_int8kv --merge \
      --out results/decode_gate.json 2>&1 | tail -8

  echo "--- 2. headline bench, new gate-derived defaults (kv8 + W8A8-384) ---"
  timeout 7200 python bench.py --engine \
      --detail_out BENCH_DETAIL_r4_default.json 2>&1 | tail -10

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
tail -8 "$LOG"
