"""Vanilla GPT-NeoX pretraining entry — analogue of the reference's
pretrain_vanilla_transformer.py for the baseline family (vanilla_31..410).

Example:
  python scripts/pretrain_vanilla_transformer.py --model vanilla_31 \
      --synthetic 5000 --steps 50 --max_length 128 --batch_size 8 [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _maybe_force_cpu():
    import os, sys
    if os.environ.get("BT_CPU") == "1" or "--cpu" in sys.argv:
        if "--cpu" in sys.argv:
            sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vanilla_31")
    ap.add_argument("--config", default=None,
                    help="reference-schema vanilla_*.yaml (overrides --model)")
    ap.add_argument("--pile", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--max_length", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from block_transformer_tpu.config import get_vanilla_config
    from block_transformer_tpu.data.packing import PackedDataset, TokenizedCorpus
    from block_transformer_tpu.train.trainer import TrainerConfig
    from block_transformer_tpu.train.vanilla_trainer import VanillaTrainer

    if args.config:
        from block_transformer_tpu.config_yaml import load_vanilla_config_yaml
        cfg = load_vanilla_config_yaml(args.config)
    else:
        cfg = get_vanilla_config(args.model)
    if args.pile:
        from block_transformer_tpu.data.mmap_dataset import MMapIndexedDataset
        mm = MMapIndexedDataset(args.pile)
        data, lengths, starts = mm.token_view()
        corpus = TokenizedCorpus(data, lengths, starts)
    else:
        rng = np.random.default_rng(0)
        docs = [rng.integers(1, cfg.vocab_size - 50, size=rng.integers(32, 400))
                for _ in range(max(args.synthetic // 200, 16))]
        lengths = np.array([len(d) for d in docs], np.int64)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        corpus = TokenizedCorpus(np.concatenate(docs), lengths, starts)
    # vanilla mode: EOS-joined packing, no block padding
    ds = PackedDataset(corpus, args.max_length, eos_token=0, block_length=None)

    tcfg = TrainerConfig(
        output_dir=args.output_dir or f"results/{args.model}",
        learning_rate=args.lr, num_train_steps=args.steps,
        stop_steps=args.steps, num_warmup_steps=max(1, args.steps // 10),
        total_batch_size=args.batch_size, max_length=args.max_length,
        save_steps=max(1, args.steps), logging_steps=10)
    trainer = VanillaTrainer(cfg, tcfg, ds)
    state = trainer.train(resume=args.resume)
    print(f"finished at step {int(state.step)}; checkpoints in {tcfg.output_dir}")


if __name__ == "__main__":
    main()
