#!/bin/bash
# Round-4 TPU queue, part B — runs after the round-4 code changes:
#   1. headline bench: decomposition + MFU at the headline batch (b384),
#      engine block + engine MFU + latency-mode row (VERDICT items 1, 8)
#   2. paged re-race with the row-batched (nbt x npp) kernel (item 4;
#      bar >= 2,100 tok/s at the d64 workload)
#   3. uniform decode-path quality gate at b384 with the W8A8 and
#      GPTQ-mixed48 rows (item 2; parent on CPU, decode workers on TPU)
#   4. train-step MFU at 5M and 85M on the chip (item 6)
#   5. driver entry compile check
set -x
LOG=results/tpu_queue_r4b.log
mkdir -p results
{
  echo "=== tpu_queue_r4b $(date -u) ==="

  echo "--- 1. headline bench (engine + latency row + headline-batch MFU) ---"
  timeout 7200 python bench.py --engine \
      --detail_out BENCH_DETAIL_r4.json 2>&1 | tail -10

  echo "--- 2. paged re-race, row-batched kernel (bar >= 2100 tok/s) ---"
  timeout 3600 python bench.py --engine --engine_kv paged --decode 64 \
      --detail_out BENCH_DETAIL_paged_r4.json 2>&1 | tail -8

  echo "--- 3. uniform decode-path gate (b384, w8a8 + gptq rows) ---"
  timeout 7200 python scripts/decode_gate.py --w8a8 --gptq \
      --out results/decode_gate.json 2>&1 | tail -15

  echo "--- 4a. train MFU: block_main_b4_5 (the 10k run's operating point) ---"
  timeout 3600 python scripts/train_mfu.py --model block_main_b4_5 \
      --batch 64 --max_length 1024 --steps 30 \
      --out results/train_mfu_5m.json 2>&1 | tail -20

  echo "--- 4b. train MFU + loss-goes-down: block_main_b4_85 ---"
  timeout 5400 python scripts/train_mfu.py --model block_main_b4_85 \
      --batch 32 --max_length 1024 --steps 200 \
      --out results/train_mfu_85m.json 2>&1 | tail -20

  echo "--- 5. driver entry compile check ---"
  timeout 2400 python __graft_entry__.py 2>&1 | tail -4

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
tail -5 "$LOG"
