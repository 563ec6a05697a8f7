#!/bin/bash
# One-shot TPU validation sequence for when the tunnel returns:
#  1. token/block stage race: int8 vs mixed48 weights (small compiles)
#  2. quality eval: mixed48 ppl + int4-KV / mixed48+int4KV decode agreement
#  3. prefill decomposition at the headline shape
# Appends everything to results/tpu_session.log.
set -x
LOG=results/tpu_session.log
mkdir -p results
{
  echo "=== tpu_session $(date -u) ==="
  timeout 3000 python scripts/mixed48_stage_probe.py 2>&1 | grep -v WARNING
  echo "--- quality (w8a8 + int4kv + mixed48) ---"
  timeout 3000 python scripts/quality_run.py --corpus /root/corpus/pybytes \
      --skip_train --steps 3000 --batch 64 --max_length 1024 \
      --out results/quality_w8a8 2>&1 | tail -30
  echo "--- prefill profile ---"
  timeout 3000 python scripts/prefill_profile.py 2>&1 | grep -v WARNING
} >> "$LOG" 2>&1
tail -5 "$LOG"
