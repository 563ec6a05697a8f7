#!/bin/bash
# Round-3 TPU queue — runs serially on the single-client chip, ordered by
# information-per-minute; each step bounded so one hang can't eat the rest.
set -x
LOG=results/tpu_queue_r3.log
mkdir -p results
{
  echo "=== tpu_queue_r3 $(date -u) ==="

  echo "--- 1. quality eval phases on the 10k TPU-trained checkpoints ---"
  timeout 5400 python scripts/quality_run.py --out results/quality10k \
      --steps 10000 --batch 64 --skip_train 2>&1 | grep -v Warning | tail -30

  echo "--- 2. W8A8 decode quality gate (the missing default gate) ---"
  timeout 5400 python scripts/w8a8_decode_gate.py \
      --model_dir results/quality10k/block_main_b4_5 \
      --out results/w8a8_decode_gate.json 2>&1 | tail -30

  echo "--- 3. prefill decomposition probe ---"
  timeout 2400 python scripts/prefill_profile.py 2>&1 | grep -v Warning | tail -20

  echo "--- 4. paged retile race (VERDICT #4: target >=2100 tok/s at d64) ---"
  timeout 3600 python bench.py --engine --engine_kv paged --decode 64 \
      --detail_out BENCH_DETAIL_paged_r3.json 2>&1 | tail -8

  echo "--- 5. headline bench + latency-mode row + MFU fields ---"
  timeout 5400 python bench.py --engine \
      --detail_out BENCH_DETAIL_r3.json 2>&1 | tail -10

  echo "--- 6. pg5m train (real-task fixture model, 3k steps) ---"
  timeout 7200 python scripts/quality_run.py --corpus /root/corpus/pgbytes \
      --out results/pgq --steps 3000 --batch 64 --block_only --train_only \
      2>&1 | tail -4

  echo "--- 7. real-task fixture eval at fp32/int8/int4 ---"
  timeout 5400 python scripts/real_task_eval.py \
      --model_dir results/pgq/block_main_b4_5 \
      --out results/real_tasks 2>&1 | tail -20

  echo "--- 8. driver entry compile check ---"
  timeout 2400 python __graft_entry__.py 2>&1 | tail -4

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
tail -5 "$LOG"
