#!/bin/bash
# One-shot TPU validation/racing sequence for when the tunnel returns.
# Priorities: (1) race chunked prefill attention end-to-end, (2) race
# mixed48+int4KV, (3) stage probe + prefill decomposition. Appends to
# results/tpu_session.log; each step bounded so one hang can't eat the rest.
set -x
LOG=results/tpu_session.log
mkdir -p results
{
  echo "=== tpu_session $(date -u) ==="
  echo "--- race 1: chunked prefill attention (default int4 KV headline) ---"
  BT_CHUNKED_PREFILL_ATTN=1 timeout 4200 python bench.py \
      --detail_out BENCH_DETAIL_chunked.json 2>&1 | grep -v WARNING | tail -4
  echo "--- race 2: mixed48 weights + int4 KV ---"
  timeout 5400 python bench.py --quantize mixed48 \
      --detail_out BENCH_DETAIL_mixed48.json 2>&1 | grep -v WARNING | tail -4
  echo "--- stage probe (token/block ms per step, int8 vs mixed48) ---"
  timeout 2400 python scripts/mixed48_stage_probe.py 2>&1 | grep -v WARNING
  echo "--- prefill decomposition ---"
  timeout 2400 python scripts/prefill_profile.py 2>&1 | grep -v WARNING
  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
tail -8 "$LOG"
