"""Train any named block config on the byte corpus with checkpoints.

The round-3/4 quality instruments (decode gate, QAT, ppl gates) ran on
block_main_b4_5 because that was the only trained checkpoint. This
wrapper trains ANY config through the same Trainer (orbax checkpoints,
resume, metrics.jsonl) so the gate ladder can be measured at non-toy
scale — e.g. block_main_b4_85, where the INT4 per-group signal fraction
is ~16x smaller and the scale hypothesis in QUALITY.md becomes
measurable instead of argued.

  python scripts/train_ckpt.py --model block_main_b4_85 --steps 5000 \
      --batch 32 --out results/scale85
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="block_main_b4_85")
    ap.add_argument("--corpus", default="/root/corpus/pybytes")
    ap.add_argument("--out", default="results/scale85")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=3e-4,
                    help="85M default 3e-4 (the 5M byte runs used 6e-4; "
                    "larger models ride lower peaks)")
    ap.add_argument("--n_checkpoints", type=int, default=5)
    ap.add_argument("--vocab", type=int, default=512)
    ap.add_argument("--vanilla", action="store_true",
                    help="--model names a vanilla config (vanilla_31/70/"
                    "160/410): train the GPTNeoX baseline instead — e.g. "
                    "the 85M block checkpoint's pairing (vanilla_70) for "
                    "the long-context positionwise-ppl comparison")
    ap.add_argument("--micro_batch", type=int, default=None,
                    help="micro batch (grad accum); vanilla full-sequence "
                    "attention residuals need a small one (default 16 "
                    "with --vanilla)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "quality_run", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "quality_run.py"))
    qr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qr)

    from block_transformer_tpu.config import get_config, get_vanilla_config
    from block_transformer_tpu.train.trainer import Trainer, TrainerConfig

    out = os.path.join(args.out, args.model)
    tkw = {}
    if args.vanilla:
        cfg = get_vanilla_config(args.model, vocab_size=args.vocab,
                                 max_position_embeddings=args.max_length)
        block_length = 1
        tkw["micro_batch_size"] = args.micro_batch or min(16, args.batch)
    else:
        cfg = get_config(args.model, vocab_size=args.vocab,
                         max_length=args.max_length)
        block_length = cfg.block_length
        if args.micro_batch:
            tkw["micro_batch_size"] = args.micro_batch
    tcfg = TrainerConfig(output_dir=out, learning_rate=args.lr,
                         num_train_steps=args.steps,
                         num_warmup_steps=max(100, args.steps // 20),
                         total_batch_size=args.batch,
                         max_length=args.max_length,
                         save_steps=max(1, args.steps // args.n_checkpoints),
                         logging_steps=25, param_dtype="float32", **tkw)
    ds = qr.make_dataset(qr.load_corpus(args.corpus), args.max_length,
                         block_length)
    print(f"[train_ckpt] {args.model} for {args.steps} steps "
          f"(b{args.batch} x {args.max_length}) -> {out}")
    t0 = time.time()
    if args.vanilla:
        from block_transformer_tpu.train.vanilla_trainer import VanillaTrainer
        trainer = VanillaTrainer(cfg, tcfg, ds)
    else:
        trainer = Trainer(cfg, tcfg, ds)
    trainer.train(resume=True)
    print(f"[train_ckpt] done in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
