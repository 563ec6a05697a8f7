#!/bin/bash
# Remaining TPU validation/racing queue. Completed in the 2026-08-18
# session (see RESULTS.md / git log): b384 headline race (12,769 tok/s),
# chunked-prefill race (loses, stays opt-in), adaptive-window engine race
# (77% of static), decomposition-instrument fix. Ordered by
# information-per-minute; each step bounded so one hang can't eat the rest.
set -x
LOG=results/tpu_session.log
mkdir -p results
{
  echo "=== tpu_session $(date -u) ==="
  echo "--- probe 1: mixed48 stage probe (token/block ms per step, int8 vs int4 token decoder) ---"
  timeout 2400 python scripts/mixed48_stage_probe.py 2>&1 | grep -v WARNING
  echo "--- probe 2: prefill decomposition ---"
  timeout 2400 python scripts/prefill_profile.py 2>&1 | grep -v WARNING
  echo "--- race: mixed48 weights + int4 KV (full-graph compile is the long pole; 2h budget) ---"
  timeout 7200 python bench.py --quantize mixed48 \
      --detail_out BENCH_DETAIL_mixed48.json 2>&1 | grep -v WARNING | tail -4
  if [ ! -s BENCH_DETAIL_mixed48.json ]; then
    echo "--- fallback: mixed48 with W8A8 off (smaller graph; W8A8 is prefill-only) ---"
    BT_W8A8=0 timeout 7200 python bench.py --quantize mixed48 \
        --detail_out BENCH_DETAIL_mixed48_now8a8.json 2>&1 | grep -v WARNING | tail -4
  fi
  echo "--- validation: paged KV pool engine on TPU ---"
  timeout 3600 python bench.py --engine --engine_kv paged --decode 64 \
      --detail_out BENCH_DETAIL_paged.json 2>&1 | grep -v WARNING | tail -6
  echo "--- backfill: vanilla_31 10k-step train (block already at ckpt-10000;"
  echo "    CPU pace measured 88.9 s/step = infeasible, TPU is ~1 s/step;"
  echo "    NOTE results/ is wiped per container — only useful if the eval"
  echo "    sweep runs in the same session and its metrics are committed) ---"
  timeout 10800 python scripts/quality_run.py --out results/quality10k \
      --steps 10000 --batch 64 --train_only 2>&1 | grep -v WARNING | tail -4
  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
tail -12 "$LOG"
