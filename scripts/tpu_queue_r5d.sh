#!/bin/bash
# Round-5 queue, part D: re-measure engine slot scaling AFTER the
# contiguous-cache Pallas write fix (the s128-s384 runs in r5a measured
# the before-curve: ~5,000 tok/s FLAT across slot counts — the
# serialized per-row XLA cache scatter). Also re-measures 16 slots for
# a full after-curve. s384 is HBM-infeasible with the engine's int8
# contiguous cache (2x12x384x16x640x128 = 12.1 GB + int8 params; the
# static b384 headline rides INT4 KV, which engine state cannot cross
# jit boundaries with on this platform) — r5a's s384 attempt crashed on
# exactly that; the after-curve tops at 256.
set -x
cd /root/repo || exit 1
LOG=results/tpu_queue_r5d.log
mkdir -p results
{
  echo "=== tpu_queue_r5d $(date -u) ==="
  while pgrep -f "tpu_queue_r5[abc].sh" >/dev/null; do
    sleep 60
  done
  echo "--- chip free $(date -u) ---"
  for S in 16 128 256; do
    timeout 5400 python bench.py --engine --engine_only --engine_slots $S \
        --engine_kv int8 --detail_out BENCH_DETAIL_engine_s${S}_wk.json \
        2>&1 | grep -v WARNING | tail -3
  done
  echo "=== r5d done $(date -u) ==="
} >> "$LOG" 2>&1
