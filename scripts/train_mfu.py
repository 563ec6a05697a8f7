"""On-chip training step time + MFU at a given config (VERDICT r3 item 6).

Runs N real optimizer steps (same jitted train step as the Trainer:
train/train_step.make_train_step, remat on, Adam) on synthetic or
mmap-corpus batches, reports best/mean s/step and model FLOPs
utilization. Training FLOPs use the standard 6*N_params*T approximation
(fwd 2NT + bwd 4NT) plus the attention term 12*l*h*S per token for both
trunks — the same accounting as utils/roofline.py's weight-FLOP model
extended to the backward pass.

The 10k quality run (QUALITY.md round 3) proved trainer mechanics at 5M;
this script is the instrument for "report train-step MFU and validate
past 5M": run it at block_main_b4_5 AND block_main_b4_85 on the chip and
put the table in RESULTS.md.

Usage:
  python scripts/train_mfu.py --model block_main_b4_85 --batch 16 \
      --max_length 1024 --steps 30
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_85")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=512,
                    help="byte-corpus vocab (matches the quality models); "
                    "pass 50304 for the reference tokenizer shape")
    ap.add_argument("--corpus", default="/root/corpus/pybytes",
                    help="mmap corpus for real batches ('' = synthetic)")
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.models import block_transformer as bt
    from block_transformer_tpu.train import optimizer as opt_mod
    from block_transformer_tpu.train import train_step as ts
    from block_transformer_tpu.utils import roofline

    cfg = get_config(args.model, vocab_size=args.vocab,
                     max_length=args.max_length)
    print(f"[train_mfu] devices: {jax.devices()}")

    tx, _ = opt_mod.make_optimizer(peak_lr=args.lr, warmup_steps=100,
                                   total_steps=max(args.steps, 1000),
                                   weight_decay=0.1, b1=0.9, b2=0.95)
    state = jax.jit(lambda k: ts.create_train_state(k, cfg, tx))(
        jax.random.PRNGKey(0))
    n_params = int(bt.count_params(state.params))
    step_fn = jax.jit(ts.make_train_step(cfg, tx, remat=True),
                      donate_argnums=(0,))

    # --- batches -----------------------------------------------------------
    L = cfg.block_length
    N = args.max_length // L
    if args.corpus and os.path.exists(args.corpus + ".bin"):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "quality_run", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "quality_run.py"))
        qr = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(qr)
        from block_transformer_tpu.data.packing import make_train_batch
        ds = qr.make_dataset(qr.load_corpus(args.corpus), args.max_length, L)
        def batch_at(i):
            idxs = (np.arange(args.batch) + i * args.batch) % len(ds)
            return {k: jnp.asarray(v)
                    for k, v in make_train_batch(ds, idxs, L).items()}
    else:
        rng = np.random.default_rng(0)
        def batch_at(i):
            ids = rng.integers(1, args.vocab - 2,
                               size=(args.batch, N, L)).astype(np.int32)
            return {"input_ids": jnp.asarray(ids),
                    "attention_mask": jnp.ones((args.batch, N, L), jnp.int32),
                    "block_attention_mask": jnp.ones((args.batch, N),
                                                     jnp.int32),
                    "labels": jnp.asarray(ids)}

    # --- timed steps -------------------------------------------------------
    t0 = time.time()
    for i in range(args.warmup):
        state, metrics = step_fn(state, batch_at(i))
    jax.block_until_ready(state.params)
    print(f"[train_mfu] warmup+compile {time.time()-t0:.0f}s")
    times, losses = [], []
    for i in range(args.steps):
        b = batch_at(args.warmup + i)
        t0 = time.perf_counter()
        state, metrics = step_fn(state, b)
        jax.block_until_ready(state.params)
        times.append(time.perf_counter() - t0)
        losses.append(float(metrics["loss"]))

    # --- FLOP accounting ---------------------------------------------------
    T = args.batch * args.max_length          # tokens per step
    bd, td = cfg.block_decoder, cfg.token_decoder.neox
    n_emb = cfg.n_embedding_tokens
    # attention: 4*h*s_ctx FLOPs/pos/layer fwd; bwd 2x. Block decoder runs
    # at block granularity (S/L positions, ctx S/L*n); token decoder at
    # token granularity with ctx <= n_exp + L.
    s_blk = N * n_emb
    attn_bd = 4 * bd.num_layers * bd.hidden_size * s_blk / 2    # avg causal
    attn_td = 4 * td.num_layers * td.hidden_size * (cfg.n_expanded_emb + L) / 2
    flops_fwd = (2 * n_params * T
                 + attn_bd * args.batch * s_blk
                 + attn_td * args.batch * (N - 1) * (cfg.n_expanded_emb + L))
    flops_step = 3 * flops_fwd                # fwd + 2x bwd
    best, mean = float(np.min(times)), float(np.mean(times))
    mfu_best = flops_step / best / roofline.PEAK_BF16_FLOPS
    report = {
        "model": args.model, "batch": args.batch,
        "max_length": args.max_length, "n_params": n_params,
        "steps": args.steps, "s_per_step_best": best,
        "s_per_step_mean": mean,
        "tokens_per_sec": T / mean,
        "flops_per_step": flops_step,
        "train_mfu_best": mfu_best,
        "train_mfu_mean": flops_step / mean / roofline.PEAK_BF16_FLOPS,
        "loss_first": losses[0], "loss_last": losses[-1],
        "loss_decreasing": losses[-1] < losses[0],
    }
    print(json.dumps(report, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
