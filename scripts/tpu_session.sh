#!/bin/bash
# One-shot TPU validation/racing sequence for when the tunnel returns.
# Ordered by information-per-minute: cheap stage probes first (they answer
# the mixed48 question without the full-graph compile), then the full
# races. Appends to results/tpu_session.log; each step bounded so one hang
# can't eat the rest.
set -x
LOG=results/tpu_session.log
mkdir -p results
{
  echo "=== tpu_session $(date -u) ==="
  echo "--- probe 1: mixed48 stage probe (token/block ms per step, int8 vs int4 token decoder) ---"
  timeout 2400 python scripts/mixed48_stage_probe.py 2>&1 | grep -v WARNING
  echo "--- probe 2: prefill decomposition ---"
  timeout 2400 python scripts/prefill_profile.py 2>&1 | grep -v WARNING
  echo "--- race 0: quant-aware HBM model raised the default auto batch to 384"
  echo "    (int8 weights + int4 KV; prior headline was b256) ---"
  timeout 4200 python bench.py \
      --detail_out BENCH_DETAIL_b384.json 2>&1 | grep -v WARNING | tail -4
  echo "--- race 1: chunked prefill attention (default int4 KV headline) ---"
  BT_CHUNKED_PREFILL_ATTN=1 timeout 4200 python bench.py \
      --detail_out BENCH_DETAIL_chunked.json 2>&1 | grep -v WARNING | tail -4
  echo "--- race 2: mixed48 weights + int4 KV (full-graph compile is the long pole; 2h budget) ---"
  timeout 7200 python bench.py --quantize mixed48 \
      --detail_out BENCH_DETAIL_mixed48.json 2>&1 | grep -v WARNING | tail -4
  if [ ! -s BENCH_DETAIL_mixed48.json ]; then
    echo "--- race 2b (fallback): mixed48 with W8A8 off (smaller graph; W8A8 is prefill-only) ---"
    BT_W8A8=0 timeout 7200 python bench.py --quantize mixed48 \
        --detail_out BENCH_DETAIL_mixed48_now8a8.json 2>&1 | grep -v WARNING | tail -4
  fi
  echo "--- race 3: adaptive-window engine vs static at the same b16 (80% bar) ---"
  timeout 4200 python bench.py --engine --batch 16 --vanilla_batch 16 \
      --kv int8 --detail_out BENCH_DETAIL_engine_b16.json 2>&1 \
      | grep -v WARNING | tail -4
  echo "--- race 4 (speculative): b512 — static model says 14.7/15.75 GiB (94%),"
  echo "    past the 0.8 auto margin; an OOM here fails fast and costs nothing ---"
  timeout 4200 python bench.py --batch 512 \
      --detail_out BENCH_DETAIL_b512.json 2>&1 | grep -v WARNING | tail -4
  echo "--- validation: paged KV pool engine on TPU ---"
  timeout 3600 python bench.py --engine --engine_kv paged --decode 64 \
      --detail_out BENCH_DETAIL_paged.json 2>&1 | grep -v WARNING | tail -6
  echo "--- backfill: vanilla_31 10k-step train (block already at ckpt-10000; "
  echo "    the CPU attempt measured 88.9 s/step = infeasible, TPU is ~1 s/step;"
  echo "    resumable, so a timeout still keeps partial progress) ---"
  timeout 10800 python scripts/quality_run.py --out results/quality10k \
      --steps 10000 --batch 64 --train_only 2>&1 | grep -v WARNING | tail -4
  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
tail -12 "$LOG"
