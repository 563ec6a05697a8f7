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
  echo "--- probe: prefill decomposition ---"
  timeout 2400 python scripts/prefill_profile.py 2>&1 | grep -v WARNING
  # mixed48 full-graph race REMOVED: the stage probe ran at b128 AND b16
  # (2026-08-18) — int4 token decoder loses to int8 at both (14.93 vs 9.62,
  # 9.55 vs 5.58 ms/block-step), so the full race cannot beat the int8
  # headline; mixed48 is a memory/quality option (RESULTS.md).
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
