#!/bin/bash
# Round-5 TPU queue (runs after the 85M train releases the chip).
# Ordered by judge priority (VERDICT r4 "next round" items):
#   1. train_mfu backfill (item 2, minutes)
#   2. precision-matched vanilla baseline races, both regimes (item 1)
#   3. 85M decode gate, 3 disjoint prompt seeds (item 4)
#   4. vanilla_70 pairing train + long-context 8192 instruments (item 6)
#   5. engine slot scaling 128/256/384 (item 5)
#   6. 300M-class train + gate (item 3)
#   7. pgq + real-task backfill, gptq_gate 85M (item 2)
# Each step bounded by timeout so one hang can't eat the queue.
set -x
cd /root/repo || exit 1
LOG=results/tpu_queue_r5a.log
mkdir -p results
{
  echo "=== tpu_queue_r5a $(date -u) ==="

  # wait for the 85M train to release the chip (single-client TPU)
  while pgrep -f "train_ckpt.py --model block_main_b4_85" >/dev/null; do
    sleep 30
  done
  echo "--- chip free $(date -u) ---"

  echo "--- 1. train MFU backfill (5m + 85m) ---"
  timeout 1800 python scripts/train_mfu.py --model block_main_b4_5 \
      --batch 64 --steps 30 --out results/train_mfu_5m.json \
      2>&1 | grep -v WARNING | tail -3
  timeout 1800 python scripts/train_mfu.py --model block_main_b4_85 \
      --batch 16 --steps 30 --out results/train_mfu_85m.json \
      2>&1 | grep -v WARNING | tail -3

  echo "--- 2a. bench: headline regime, int8-quantized vanilla baseline ---"
  timeout 5400 python bench.py --detail_out BENCH_DETAIL_vanilla_int8.json \
      2>&1 | grep -v WARNING | tail -4

  echo "--- 2b. bench: p128/d2048 regime, int8-quantized vanilla ---"
  timeout 5400 python bench.py --prefill 128 --decode 2048 \
      --detail_out BENCH_DETAIL_vanilla_int8_d2048.json \
      2>&1 | grep -v WARNING | tail -4

  echo "--- 3a. decode gate 85M seed 3 (full ladder, w8a8 + gptq) ---"
  timeout 7200 python scripts/decode_gate.py --model block_main_b4_85 \
      --model_dir results/scale85/block_main_b4_85 --lr 3e-4 --steps 5000 \
      --w8a8 --gptq --prompt_seed 3 \
      --out results/decode_gate_85m.json 2>&1 | grep -v WARNING | tail -16

  echo "--- 3b/3c. decode gate 85M seeds 17 / 29 (borderline variants) ---"
  for SEED in 17 29; do
    timeout 5400 python scripts/decode_gate.py --model block_main_b4_85 \
        --model_dir results/scale85/block_main_b4_85 --lr 3e-4 --steps 5000 \
        --w8a8 --gptq --prompt_seed $SEED \
        --only w8a8_int8w_int8kv,w8a8_int8w_int4kv,mixed48_int4kv,gptq_mixed48_int4kv,int8w_int4kv \
        --out results/decode_gate_85m_s$SEED.json \
        2>&1 | grep -v WARNING | tail -8
  done

  echo "--- 4a. vanilla_70 pairing train (2500 steps) ---"
  timeout 5400 python scripts/train_ckpt.py --model vanilla_70 --vanilla \
      --steps 2500 --batch 32 --lr 3e-4 --n_checkpoints 2 \
      --out results/scale85 2>&1 | grep -v WARNING | tail -3

  echo "--- 4b. long-context 8192 instruments on 85M (+ vanilla pairing) ---"
  timeout 5400 python scripts/longctx_85m.py --context 8192 \
      --vanilla vanilla_70 --vanilla_dir results/scale85/vanilla_70 \
      --vanilla_steps 2500 --vanilla_lr 3e-4 \
      --out results/longctx_85m.json 2>&1 | grep -v WARNING | tail -6

  echo "--- 5. engine slot scaling: 128 / 256 / 384 slots ---"
  for S in 128 256 384; do
    timeout 5400 python bench.py --engine --engine_only --engine_slots $S \
        --engine_kv int8 --detail_out BENCH_DETAIL_engine_s$S.json \
        2>&1 | grep -v WARNING | tail -3
  done

  echo "--- 6a. 300M-class train (block_main_b4_300, 2000 steps) ---"
  timeout 10800 python scripts/train_ckpt.py --model block_main_b4_300 \
      --steps 2000 --batch 16 --lr 2e-4 --n_checkpoints 2 \
      --out results/scale300 2>&1 | grep -v WARNING | tail -3

  echo "--- 6b. decode gate 300M (headline variants) ---"
  timeout 7200 python scripts/decode_gate.py --model block_main_b4_300 \
      --model_dir results/scale300/block_main_b4_300 --lr 2e-4 --steps 2000 \
      --w8a8 --batch 192 --prompt_seed 3 \
      --only int8kv,int4kv,int8w_int8kv,int8w_int4kv,mixed48_int4kv,w8a8_int8w_int8kv,w8a8_int8w_int4kv \
      --out results/decode_gate_300m.json 2>&1 | grep -v WARNING | tail -10

  echo "--- 7a. pgq train + real-task eval backfill ---"
  timeout 1200 python scripts/build_pg_corpus.py 2>&1 | tail -2
  timeout 3600 python scripts/train_ckpt.py --model block_main_b4_5 \
      --steps 3000 --batch 16 --lr 6e-4 --corpus /root/corpus/pgbytes \
      --n_checkpoints 1 --out results/pgq 2>&1 | grep -v WARNING | tail -2
  timeout 5400 python scripts/real_task_eval.py \
      --model_dir results/pgq/block_main_b4_5 --steps 3000 \
      --out results/real_tasks 2>&1 | grep -v WARNING | tail -6

  echo "--- 7b. gptq_gate on 85M ---"
  timeout 5400 python scripts/gptq_gate.py \
      --model_dir results/scale85/block_main_b4_85 --lr 3e-4 --steps 5000 \
      --out results/gptq_gate_85m.json 2>&1 | grep -v WARNING | tail -6

  echo "=== done $(date -u) ==="
} >> "$LOG" 2>&1
tail -5 "$LOG"
